"""Continuous-batching serving load test on the real chip.

Submits a burst of mixed-length requests (4 s / 8 s / 30 s clips) to the
ContinuousBatcher and drives it to completion on the calling thread,
reporting per-request latency percentiles and aggregate throughput.
Synthetic weights never emit EOS, so every request decodes to its max_new
cap — an upper bound on real decode work.

Run: python scripts/bench_serving.py [--quant int4] [--requests 32]
     python scripts/bench_serving.py --precision auto [--occ 2]

``--precision auto`` keeps bf16 AND int8 decoder params resident and
picks per decode segment by live-slot occupancy (crossover via --occ /
ASR_SERVING_INT8_MAX_OCC); measure it against --quant None and
--quant int8 at several --slots values to locate the real crossover.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(n_requests=24, quant=None, max_new=32, n_slots=8,
         precision="engine", occ=None, kv=None):
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.config import AsrConfig
    from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
    from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params
    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine
    from qwen3_asr_rs_tpu.runtime.serving import ContinuousBatcher, Request

    config = AsrConfig()
    enc_params = init_encoder_params(config.audio, dtype=jnp.bfloat16)
    dec_params = init_decoder_params(config.text, dtype=jnp.bfloat16)

    class _Tok:
        def encode(self, t):
            return [101]

        def decode(self, ids):
            return ""

    engine = AsrEngine(
        model_dir=None, dtype=jnp.bfloat16, max_new_tokens=max_new,
        chunk_buckets=(4, 8, 30), config=config,
        params=(enc_params, dec_params), tokenizer=_Tok(),
        quantize=quant,
    )
    if occ is not None:
        os.environ["ASR_SERVING_INT8_MAX_OCC"] = str(occ)
    batcher = ContinuousBatcher(
        engine, n_slots=n_slots, segment_steps=8,
        max_new_tokens=max_new, max_chunks=30,
        serving_precision=precision, kv_dtype=kv,
    )

    rng = np.random.default_rng(0)
    lengths = [4, 8, 30]

    def clip(seconds):
        return (rng.standard_normal(16000 * seconds) * 0.1).astype(
            np.float32
        )

    # compile warmup: the batcher's own warmup covers the full graph
    # set the timed burst can hit — per-bucket monolithic admission,
    # batched-admission sizes per BUCKET (the ad-hoc warmup this
    # replaced only compiled the smallest bucket's batched graphs, so
    # mixed bursts paid (8,n)/(30,n) compiles inside the timed region),
    # full-occupancy segments in both precision variants, and the
    # sampling/nucleus segment graphs.
    print("warmup (compiles)...", file=sys.stderr)
    batcher.warmup()

    reqs = []
    audio_total = 0.0
    for i in range(n_requests):
        sec = lengths[i % len(lengths)]
        audio_total += sec
        reqs.append((sec, Request(samples=clip(sec))))

    t0 = time.perf_counter()
    for _, r in reqs:
        batcher.submit(r)  # burst arrival
    while not all(r.event.is_set() for _, r in reqs):
        batcher.step()
    wall = time.perf_counter() - t0

    by_len = {}
    for sec, r in reqs:
        lat = r.finish_time - r.submit_time
        by_len.setdefault(sec, []).append(lat)
    print(
        f"quant={quant} precision={precision} kv={kv or 'bf16'}: "
        f"{n_requests} reqs ({audio_total:.0f} s audio) in "
        f"{wall:.2f} s -> {audio_total / wall:.1f}x RT aggregate "
        f"({n_slots} slots, {max_new} tok/req cap)"
    )
    for sec in lengths:
        ls = sorted(by_len[sec])
        p50 = ls[len(ls) // 2]
        p95 = ls[min(len(ls) - 1, int(len(ls) * 0.95))]
        print(
            f"  {sec:3d}s clips: p50 {p50*1000:7.0f} ms   "
            f"p95 {p95*1000:7.0f} ms  (n={len(ls)})"
        )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default=None)
    ap.add_argument("--requests", type=int, default=24)
    ap.add_argument("--max-new", type=int, default=32)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--precision", default="engine",
                    choices=["engine", "auto", "bf16", "int8"])
    ap.add_argument("--occ", type=int, default=None,
                    help="auto mode int8 occupancy crossover")
    ap.add_argument("--kv", default=None, choices=["bf16", "int8"],
                    help="slot-pool KV slab dtype (int8 = 2x slots/byte)")
    a = ap.parse_args()
    main(a.requests, a.quant, a.max_new, a.slots, a.precision, a.occ,
         a.kv)
