from .pipeline import make_pair_pipeline, make_sharded_pair_pipeline

__all__ = ["make_pair_pipeline", "make_sharded_pair_pipeline"]
