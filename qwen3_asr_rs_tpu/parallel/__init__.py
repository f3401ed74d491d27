from .mesh import make_mesh
from .sharding import (
    decoder_param_specs,
    encoder_param_specs,
    shard_params,
)

__all__ = [
    "make_mesh",
    "decoder_param_specs",
    "encoder_param_specs",
    "shard_params",
]
