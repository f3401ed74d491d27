"""qwen3_asr_rs_tpu — TPU-native Qwen3-ASR framework (JAX/XLA/Pallas).

A ground-up TPU-first rebuild of the capabilities of the reference
`second-state/qwen3_asr_rs` CLI: transcribe any audio file with
Qwen3-ASR (0.6B / 1.7B) via a Whisper-style log-mel frontend, a chunked
windowed-attention audio encoder, and a Qwen3 GQA decoder with MRoPE,
greedy-decoded on device.

Design differences from the reference (deliberate, TPU-first):
  * single jit-compiled bucketed-shape graphs instead of per-op FFI calls
  * preallocated slab KV cache + `lax.while_loop` on-device decode loop
    instead of concat-grow caches with per-token host sync
  * windowed encoder attention as batched dense windows instead of a
    materialized O(T^2) additive mask
  * `jax.sharding.Mesh` based tensor/data parallelism for multi-chip
"""

__version__ = "0.3.0"

from .config import AsrConfig, AudioEncoderConfig, TextDecoderConfig, ThinkerConfig

__all__ = [
    "AsrConfig",
    "AudioEncoderConfig",
    "TextDecoderConfig",
    "ThinkerConfig",
    "__version__",
]
