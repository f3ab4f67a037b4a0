from .loader import DataLoader, collate
from .synthetic_shapes import SyntheticShapes
from .image_pair import ImagePairDataset


def get_dataset(config):
    """Build a dataset by config['type'] — the reference's reflection
    dispatch getattr(datasets, type)(config) (train.py:51-52)."""
    dtype = config.get("type", "ImagePairDataset")
    if dtype == "ImagePairDataset":
        return ImagePairDataset(config)
    if dtype == "SyntheticShapes":
        return SyntheticShapes(config)
    if dtype == "SatThermalGeoDataset":
        from .sat_thermal import SatThermalGeoDataset
        return SatThermalGeoDataset(config)
    raise ValueError(f"unknown dataset type: {dtype}")


__all__ = ["DataLoader", "collate", "SyntheticShapes", "ImagePairDataset",
           "get_dataset"]
