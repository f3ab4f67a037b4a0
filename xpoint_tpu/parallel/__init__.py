from .mesh import make_mesh, shard_batch, replicate
from .train_step import make_train_step, TrainState
from .ring_scan import ring_linear_scan

__all__ = ["make_mesh", "shard_batch", "replicate", "make_train_step",
           "TrainState", "ring_linear_scan"]
