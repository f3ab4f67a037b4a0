from .torch_converter import convert_torch_state_dict, load_torch_checkpoint

__all__ = ["convert_torch_state_dict", "load_torch_checkpoint"]
