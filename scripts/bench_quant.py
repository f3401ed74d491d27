"""Compare bf16 vs int8 single-stream decode throughput on the real chip."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(quantize):
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
        model_dir=None, dtype=jnp.bfloat16, max_new_tokens=128,
        chunk_buckets=(30,), config=config,
        params=(enc_params, dec_params), tokenizer=_Tok(),
        quantize=quantize,
    )
    rng = np.random.default_rng(0)
    clip = (rng.standard_normal(16000 * 30) * 0.1).astype(np.float32)
    engine.transcribe_samples(clip)  # compile
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        engine.transcribe_samples(clip)
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    print(f"quantize={quantize}: median {med*1000:.1f} ms -> "
          f"{30/med:.1f}x RT  ({[round(t*1000,1) for t in times]})")
    return med


if __name__ == "__main__":
    run(None)
    run("int8")
