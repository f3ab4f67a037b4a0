from .gridops import space_to_depth, depth_to_space
from .warp import warp_image, warp_image_batch, warp_image_multi
from .nms import box_nms
from .detector import prob_from_logits
from .descriptor import interpolate_descriptors
from .matching import mnn_match, descriptor_distance_matrix

__all__ = [
    "space_to_depth",
    "depth_to_space",
    "warp_image",
    "warp_image_batch",
    "warp_image_multi",
    "box_nms",
    "prob_from_logits",
    "interpolate_descriptors",
    "mnn_match",
    "descriptor_distance_matrix",
]
