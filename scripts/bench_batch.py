"""Batched-serving throughput on the real chip (not the driver headline)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(batch=8, seconds=30, tokens=128, quant=None):
    import jax
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.config import AsrConfig
    from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
    from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params
    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine

    config = AsrConfig()
    enc_params = init_encoder_params(config.audio, dtype=jnp.bfloat16)
    dec_params = init_decoder_params(config.text, dtype=jnp.bfloat16)

    class _Tok:
        def encode(self, t):
            return [101]

        def decode(self, ids):
            return ""

    engine = AsrEngine(
        model_dir=None, dtype=jnp.bfloat16, max_new_tokens=tokens,
        chunk_buckets=(seconds,), config=config,
        params=(enc_params, dec_params), tokenizer=_Tok(),
        quantize=quant,
    )
    rng = np.random.default_rng(0)
    clips = [
        (rng.standard_normal(16000 * seconds) * 0.1).astype(np.float32)
        for _ in range(batch)
    ]
    # warmup + compile
    engine.transcribe_batch(clips)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        engine.transcribe_batch(clips)
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    xrt = batch * seconds / med
    print(
        f"batch={batch} quant={quant}: median {med*1000:.1f} ms -> {xrt:.1f}x RT per chip "
        f"({[round(t*1000,1) for t in times]})"
    )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default=None)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=int, default=30)
    ap.add_argument("--tokens", type=int, default=128)
    a = ap.parse_args()
    main(a.batch, a.seconds, a.tokens, a.quant)
