from .dicttools import (
    dict_update,
    dict_to_obj,
    parse_primitives,
    div0,
    get_new_filename,
)
from .keypoints import generate_keypoint_map

__all__ = [
    "dict_update",
    "dict_to_obj",
    "parse_primitives",
    "div0",
    "get_new_filename",
    "generate_keypoint_map",
]
