from .load import load_audio
from .resample import resample_sinc

__all__ = ["load_audio", "resample_sinc"]
