from .loader import load_checkpoint, load_model_params

__all__ = ["load_checkpoint", "load_model_params"]
