from .homographic_adaptation import (
    homographic_adaptation_multispectral,
    homographic_adaptation,
    search_window,
    HA_DEFAULT_CONFIG,
)

__all__ = ["homographic_adaptation_multispectral", "homographic_adaptation",
           "search_window", "HA_DEFAULT_CONFIG"]
