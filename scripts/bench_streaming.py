"""On-chip streaming-update latency at 0.6B (synthetic weights).

Feeds 1 s chunks into a StreamingSession and times each update(): the
incremental cost is O(new audio) — at most the newly-completed window +
tail window encode, a ~100-250-position chunk prefill into the
persistent KV slab, and the greedy decode. Prints per-update latency and
a summary line for docs/PERFORMANCE.md.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.config import AsrConfig
    from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
    from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params
    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine
    from qwen3_asr_rs_tpu.runtime.streaming import StreamingSession

    config = AsrConfig()
    print(f"devices: {jax.devices()}", file=sys.stderr)
    enc_params = init_encoder_params(config.audio, dtype=jnp.bfloat16)
    dec_params = init_decoder_params(config.text, dtype=jnp.bfloat16)

    class _Tok:
        def encode(self, text):
            return [101] * 4

        def decode(self, ids):
            return ""

    engine = AsrEngine(
        model_dir=None, dtype=jnp.bfloat16, max_new_tokens=64,
        chunk_buckets=(30,), config=config,
        params=(enc_params, dec_params), tokenizer=_Tok(),
    )
    session = StreamingSession(
        engine, max_stream_seconds=60.0, max_new_tokens=32
    )

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000 * 31) * 0.1).astype(np.float32)
    # loud onset so the running mel max stabilizes immediately
    audio[:8000] += np.sin(
        2 * np.pi * 300 * np.arange(8000) / 16000
    ).astype(np.float32)

    lat = []
    for sec in range(1, 31):
        session.buffer = audio[: sec * 16000]
        t0 = time.perf_counter()
        session.update()
        dt = (time.perf_counter() - t0) * 1000
        stats = session.last_update_stats
        # first updates pay compiles; report steady state
        print(
            f"  t={sec:2d}s: {dt:7.1f} ms  windows={stats['windows_encoded']}"
            f" chunk={stats['chunk_positions']}"
            f" tokens={stats['decoded_tokens']}",
            file=sys.stderr,
        )
        lat.append(dt)

    steady = sorted(lat[10:])  # past all compile paths
    out = {
        "stream_update_p50_ms": round(steady[len(steady) // 2], 1),
        "stream_update_p90_ms": round(steady[int(len(steady) * 0.9)], 1),
        "decoded_tokens_per_update": 32,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
