from .safetensors_io import load_safetensors, save_safetensors
from . import torch_convert

__all__ = ["load_safetensors", "save_safetensors", "torch_convert"]
