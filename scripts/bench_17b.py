"""On-chip benchmark at full Qwen3-ASR-1.7B scale (synthetic weights).

The 1.7B decoder's bf16 layer weights (~100 MB) exceed the decode
megakernel's double-buffered VMEM budget, so bf16 decode takes the scan
path (the VMEM guard's job); int8 (~50 MB/layer) keeps the megakernel.
Run: python scripts/bench_17b.py  -> prints per-config xRT lines.
"""

import json
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
    for quant in (None, "int8", "int4"):
        tag = quant or "bf16"
        print(f"--- 1.7B {tag} 30 s / 128 tok", file=sys.stderr)
        eng = _mk_engine(config, params, quant, max_new=128, bucket=30)
        t30 = _bench_once(eng, config, 30.0, 30)
        rows[f"17b_{tag}_xrt_30s_128tok"] = round(30.0 / t30, 2)
        rows[f"17b_{tag}_ms_30s"] = round(t30 * 1000, 1)
        del eng
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
