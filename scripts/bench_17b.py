"""On-chip benchmark at full Qwen3-ASR-1.7B scale (synthetic weights).

bf16 streams each layer through the megakernel in FFN tiles
(layer-split: ~100 MB/layer exceeds the whole-layer VMEM budget);
measured round 3: bf16 decode is weight-streaming-floor-bound either
way (~44x at 30 s / 128 tok). int8 runs the whole-layer megakernel;
the int8_lm4 row adds the int4 lm_head (ASR_LM_BITS=4) + int8 KV slab
— the fastest quality-unvalidated int8-family config (87x; int4 129x).
Run: python scripts/bench_17b.py  -> prints per-config xRT lines.
"""

import json
import os
import sys

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

    rows = {}
    cases = [
        ("bf16", None, {}),
        ("int8", "int8", {}),
        ("int8_lm4_kv8", "int8", {"ASR_LM_BITS": "4", "ASR_KV": "int8"}),
        ("int4", "int4", {}),
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
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
