from .text_decoder import (
    TextDecoder,
    init_decoder_params,
)
from .audio_encoder import (
    AudioEncoder,
    init_encoder_params,
)

__all__ = [
    "TextDecoder",
    "init_decoder_params",
    "AudioEncoder",
    "init_encoder_params",
]
