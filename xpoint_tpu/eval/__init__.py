from .pipeline import make_pair_pipeline

__all__ = ["make_pair_pipeline"]
