"""On-chip benchmark at full Qwen3-ASR-1.7B scale (synthetic weights).

bf16 streams each layer through the megakernel in FFN tiles
(layer-split: ~100 MB/layer exceeds the whole-layer VMEM budget);
measured round 3: bf16 decode is weight-streaming-floor-bound either
way (~44x at 30 s / 128 tok). int8 runs the whole-layer megakernel;
the int8_lm4 row adds the int4 lm_head (ASR_LM_BITS=4) + int8 KV slab
— the fastest quality-unvalidated int8-family config (87x; int4 129x).

Modes (argv[1], default "single"):
  single  — per-precision single-stream xRT at 30 s / 128 tok
  batch   — BATCHED offline dispatch (bf16/int8 x batch 4/8): the
            quality-safe route past 100x at 1.7B — the per-token weight
            stream amortizes across the batch (round-3 verdict item 3)
  latency — 4 s clip / 16 tokens p50 per precision (the round-2 table's
            empty 1.7B cells)

Run: python scripts/bench_17b.py [single|batch|latency|all]
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def _setup():
    import jax
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.config import synthetic_17b_config
    from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
    from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params

    config = synthetic_17b_config()
    print(f"devices: {jax.devices()}", file=sys.stderr)
    enc_params = init_encoder_params(config.audio, dtype=jnp.bfloat16)
    dec_params = init_decoder_params(config.text, dtype=jnp.bfloat16)
    return config, (enc_params, dec_params)


def single(config, params, rows):
    from bench import _bench_once, _mk_engine

    cases = [
        ("bf16", None, {}),
        ("int8", "int8", {}),
        ("int8_lm4_kv8", "int8", {"ASR_LM_BITS": "4", "ASR_KV": "int8"}),
        ("int4", "int4", {}),
        # the int4 quality hedge: grouped scales, scan-path decode —
        # still streams int4 bytes, so at 1.7B (weight-stream-bound)
        # it keeps most of int4's headroom
        ("int4g", "int4g", {}),
    ]
    for tag, quant, env in cases:
        for k in ("ASR_LM_BITS", "ASR_KV"):
            os.environ.pop(k, None)
        os.environ.update(env)
        print(f"--- 1.7B {tag} 30 s / 128 tok", file=sys.stderr)
        eng = _mk_engine(config, params, quant, max_new=128, bucket=30)
        t30 = _bench_once(eng, config, 30.0, 30)
        rows[f"17b_{tag}_xrt_30s_128tok"] = round(30.0 / t30, 2)
        rows[f"17b_{tag}_ms_30s"] = round(t30 * 1000, 1)
        del eng
    for k in ("ASR_LM_BITS", "ASR_KV"):
        os.environ.pop(k, None)


def latency(config, params, rows):
    """4 s clip / 16 new tokens: the interactive p50 per precision."""
    from bench import _bench_once, _mk_engine

    for tag, quant in (("bf16", None), ("int8", "int8")):
        print(f"--- 1.7B {tag} 4 s / 16 tok (latency)", file=sys.stderr)
        eng = _mk_engine(config, params, quant, max_new=16, bucket=4)
        t4 = _bench_once(eng, config, 4.0, 4)
        rows[f"17b_{tag}_p50_ms_4s_16tok"] = round(t4 * 1000, 1)
        del eng


def batch(config, params, rows):
    """Batched offline dispatch: weight stream amortized over B."""
    import time

    from bench import _mk_engine

    rng = np.random.default_rng(0)
    for tag, quant in (("bf16", None), ("int8", "int8")):
        eng = _mk_engine(config, params, quant, max_new=128, bucket=30)
        for b in (4, 8):
            print(f"--- 1.7B {tag} batch {b} x 30 s / 128 tok",
                  file=sys.stderr)
            clips = [
                (rng.standard_normal(16000 * 30) * 0.1).astype(np.float32)
                for _ in range(b)
            ]
            eng.transcribe_batch(clips)  # compile
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                eng.transcribe_batch(clips)
                times.append(time.perf_counter() - t0)
            med = sorted(times)[len(times) // 2]
            rows[f"17b_{tag}_b{b}_xrt_30s_128tok"] = round(
                b * 30.0 / med, 2
            )
            rows[f"17b_{tag}_b{b}_ms"] = round(med * 1000, 1)
            print(
                f"  batch {b}: {[round(t * 1000, 1) for t in times]} ms "
                f"-> {b * 30.0 / med:.1f}x aggregate", file=sys.stderr,
            )
        del eng


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "single"
    config, params = _setup()
    rows = {}
    if which in ("single", "all"):
        single(config, params, rows)
    if which in ("latency", "all"):
        latency(config, params, rows)
    if which in ("batch", "all"):
        batch(config, params, rows)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
