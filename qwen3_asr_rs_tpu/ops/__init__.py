from .norms import layer_norm, rms_norm
from .rotary import RotaryTable, apply_rotary
from .attention import dense_attention

__all__ = [
    "layer_norm",
    "rms_norm",
    "RotaryTable",
    "apply_rotary",
    "dense_attention",
]
