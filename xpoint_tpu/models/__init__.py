from .xpoint import XPointNet, build_xpoint, DEFAULT_CONFIG
from .vssm import VSSM, build_vssm_from_config
from .regnet import RegNet
from .heads import CNNEncoder, Head


def get_model(config):
    """Build a model by config['type'] name — the reference's reflection
    dispatch getattr(models, type)(config) (train.py:66)."""
    mtype = config.get("type", "XPoint")
    if mtype == "XPoint":
        return build_xpoint(config)
    if mtype == "SuperPointMagicLeap":
        from .superpoint import build_superpoint
        return build_superpoint(config)
    if mtype == "ClassicDetectors":
        from .classic import ClassicDetectors
        return ClassicDetectors(config), config
    raise ValueError(f"unknown model type: {mtype}")


__all__ = ["XPointNet", "build_xpoint", "DEFAULT_CONFIG", "VSSM",
           "build_vssm_from_config", "RegNet", "CNNEncoder", "Head",
           "get_model"]
