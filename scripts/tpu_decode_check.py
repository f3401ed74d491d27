"""On-chip decode-path compile checks the kernel smoke tier cannot see.

tpu_kernel_check.py exercises the standalone kernels; BOTH round-4
Mosaic failures lived in the fused decode paths that only engage when
the KV slab exceeds the megakernel's VMEM budget:

  * the DMA block-clamp sublane alignment (1.7B batch-8), and
  * the int8-KV scale-slab LANE alignment (kv8 + forced DMA).

This drives the real engine through those exact modes on the chip:
batch-8 decode (DMA attention in the megakernel) and ASR_KV=int8 with
ASR_SLAB_MODE=dma. Synthetic weights; the check is that every graph
Mosaic-compiles and runs (content is garbage by construction).

Run: python scripts/tpu_decode_check.py   (~10 min cold through the
tunnel; cached compiles after)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _engine(quantize=None, max_new=64):
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.config import AsrConfig
    from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
    from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params
    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine

    config = AsrConfig()
    enc = init_encoder_params(config.audio, dtype=jnp.bfloat16)
    dec = init_decoder_params(config.text, dtype=jnp.bfloat16)

    class _Tok:
        def encode(self, t):
            return [101]

        def decode(self, ids):
            return ""

    return AsrEngine(
        model_dir=None, dtype=jnp.bfloat16, max_new_tokens=max_new,
        chunk_buckets=(30,), config=config, params=(enc, dec),
        tokenizer=_Tok(), quantize=quantize,
    )


def main():
    rng = np.random.default_rng(0)
    clip = (rng.standard_normal(16000 * 30) * 0.1).astype(np.float32)

    # 1. batch-8 bf16: megakernel DMA attention (slab > VMEM budget),
    #    clamped last block — the 1.7B batch-8 failure shape class
    eng = _engine()
    t0 = time.perf_counter()
    eng.transcribe_batch([clip] * 8)
    print(f"batch-8 DMA decode OK ({time.perf_counter() - t0:.0f}s cold)")
    del eng

    # 2. int8 KV + forced DMA slab mode: the scale-slab lane-slice path
    os.environ["ASR_KV"] = "int8"
    os.environ["ASR_SLAB_MODE"] = "dma"
    try:
        eng = _engine()
        eng.transcribe_samples(clip)
        t0 = time.perf_counter()
        eng.transcribe_samples(clip)
        print(
            f"kv8 + DMA slab mode OK "
            f"({30 / (time.perf_counter() - t0):.1f}x RT)"
        )
        del eng
    finally:
        os.environ.pop("ASR_KV", None)
        os.environ.pop("ASR_SLAB_MODE", None)

    print("TPU decode-path check OK")


if __name__ == "__main__":
    main()
