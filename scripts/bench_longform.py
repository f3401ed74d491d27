"""Long-form throughput: batched chunk decode vs sequential on the chip.

transcribe_long now decodes overlapped chunks in batches through
transcribe_batch (runtime/longform.py), amortizing the decode weight
stream across concurrent chunks. This measures the end-to-end win on a
synthetic-weights 0.6B engine with a long clip.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(minutes=5.0, seg_seconds=30, tokens=64, quant=None):
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.config import AsrConfig
    from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
    from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params
    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine
    from qwen3_asr_rs_tpu.runtime.longform import transcribe_long

    config = AsrConfig()
    enc_params = init_encoder_params(config.audio, dtype=jnp.bfloat16)
    dec_params = init_decoder_params(config.text, dtype=jnp.bfloat16)

    class _Tok:
        def encode(self, t):
            return [101]

        def decode(self, ids):
            return "tok " * len(ids)

    engine = AsrEngine(
        model_dir=None, dtype=jnp.bfloat16, max_new_tokens=tokens,
        chunk_buckets=(seg_seconds,), config=config,
        params=(enc_params, dec_params), tokenizer=_Tok(),
        quantize=quant,
    )
    rng = np.random.default_rng(0)
    total_s = minutes * 60
    samples = (
        rng.standard_normal(int(16000 * total_s)) * 0.1
    ).astype(np.float32)

    for label, bc in (("sequential", 1), ("batched4", 4), ("batched8", 8)):
        # warmup/compile, then timed runs
        transcribe_long(engine, samples, segment_seconds=seg_seconds,
                        batch_chunks=bc)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = transcribe_long(engine, samples,
                                segment_seconds=seg_seconds,
                                batch_chunks=bc)
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        print(
            f"longform {label} (batch_chunks={bc}, quant={quant}): "
            f"{total_s/60:.1f} min audio in {med:.2f} s -> "
            f"{total_s/med:.1f}x RT "
            f"({[round(t, 2) for t in times]}; "
            f"{len(r.segments or [])} segments)"
        )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=5.0)
    ap.add_argument("--seg-seconds", type=int, default=30)
    ap.add_argument("--tokens", type=int, default=64)
    ap.add_argument("--quant", default=None)
    a = ap.parse_args()
    main(a.minutes, a.seg_seconds, a.tokens, a.quant)
