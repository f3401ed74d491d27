"""1.7B int8 megakernel variants: merged whole-layer vs unmerged
layer-split FFN tiles.

Round 3b measured int8 1.7B at ~70% of its streaming floor with 45 MB
double-buffered whole-layer blocks; bf16's layer-split A/B showed ~10 MB
FFN tiles double-buffer better against the VMEM ceiling. int8 always
merged qkv/gateup on single-device (which blocks layer-split), so this
was unmeasurable until ASR_MERGE_QKV=0. Cases:

  merged_nt1    — shipping default (one wide qkv dot, whole layer)
  unmerged_nt1  — 7 dots/layer, whole layer (isolates the merge effect)
  unmerged_nt2/4 — layer-split FFN streaming in 2/4 tiles

Run: python scripts/perf_17b_int8_tiles.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.config import synthetic_17b_config
    from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
    from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params

    from bench import _bench_once, _mk_engine

    config = synthetic_17b_config()
    print(f"devices: {jax.devices()}", file=sys.stderr)

    enc_params = init_encoder_params(config.audio, dtype=jnp.bfloat16)
    dec_params = init_decoder_params(config.text, dtype=jnp.bfloat16)
    params = (enc_params, dec_params)

    budget = float(os.environ.get("ASR_BENCH_BUDGET_S", "1800"))
    t0 = time.time()
    rows = {}
    cases = [
        ("merged_nt1", {}),
        ("unmerged_nt1", {"ASR_MERGE_QKV": "0"}),
        ("unmerged_nt2", {"ASR_MERGE_QKV": "0", "ASR_FFN_TILES": "2"}),
        ("unmerged_nt4", {"ASR_MERGE_QKV": "0", "ASR_FFN_TILES": "4"}),
    ]
    for tag, env in cases:
        if time.time() - t0 > budget:
            rows["truncated_at"] = tag
            break
        for k in ("ASR_MERGE_QKV", "ASR_FFN_TILES"):
            os.environ.pop(k, None)
        os.environ.update(env)
        print(f"--- 1.7B int8 {tag} 30 s / 128 tok", file=sys.stderr)
        eng = _mk_engine(config, params, "int8", max_new=128, bucket=30)
        t30 = _bench_once(eng, config, 30.0, 30)
        rows[f"17b_int8_{tag}_xrt"] = round(30.0 / t30, 2)
        rows[f"17b_int8_{tag}_ms"] = round(t30 * 1000, 1)
        del eng
    for k in ("ASR_MERGE_QKV", "ASR_FFN_TILES"):
        os.environ.pop(k, None)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
