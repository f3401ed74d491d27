"""A/B: merged qkv/gateup vs separate projections in the decode megakernel.

Measures device-side ms/token at 0.6B with a 64-step in-jit greedy loop,
RTT-corrected (a calibrated no-op fetch is subtracted — through the
tunnel only a host fetch synchronizes, so each timed run embeds one RTT).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STEPS = 64
S_MAX = 704
P = 576


def main():
    import jax
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.config import AsrConfig
    from qwen3_asr_rs_tpu.models.text_decoder import (
        KVCache, TextDecoder, init_decoder_params,
    )
    from qwen3_asr_rs_tpu.weights.quantize import quantize_decoder_params

    cfg = AsrConfig().text
    params = init_decoder_params(cfg, dtype=jnp.bfloat16)
    dec = TextDecoder(cfg, max_position=2048)
    rng = np.random.default_rng(0)

    # RTT calibration: dispatch + fetch a FRESH tiny array each time (a
    # re-fetch of the same array returns jax's cached host copy and
    # measures ~0)
    base = jnp.zeros((4,), jnp.int32)
    np.asarray(base + 0)  # compile the add
    rtts = []
    for i in range(7):
        t0 = time.perf_counter()
        np.asarray(base + (i + 1))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]
    print(f"no-op dispatch+fetch (RTT): {rtt*1000:.1f} ms", file=sys.stderr)

    def mk_cache(qp, kv8=False):
        from qwen3_asr_rs_tpu.models.text_decoder import quantize_kv

        k = jnp.asarray(
            rng.standard_normal(
                (cfg.num_hidden_layers, 1, cfg.num_key_value_heads,
                 S_MAX, cfg.head_dim)
            ) * 0.3,
            jnp.bfloat16,
        )
        v = jnp.asarray(
            rng.standard_normal(k.shape) * 0.3, jnp.bfloat16
        )
        if kv8:
            kq, ks = quantize_kv(k)
            vq, vs = quantize_kv(v)
            return KVCache(k=kq, v=vq, k_scale=ks, v_scale=vs)
        return KVCache(k=k, v=v)

    @jax.jit
    def loop(qp, cache, tok):
        def body(s):
            cache, tok, i = s
            t, cache = dec.decode_step_token(
                qp, tok, jnp.int32(P) + i, cache
            )
            return cache, t, i + 1

        def cond(s):
            return s[2] < STEPS

        cache, tok, _ = jax.lax.while_loop(
            cond, body, (cache, tok, jnp.int32(0))
        )
        return tok

    configs = [
        (8, False, 8, False, "int8 sep    lm8"),
        (8, True, 8, False, "int8 merged lm8"),
        (8, True, 8, True, "int8 merged lm8 kv8"),
        (4, False, 8, False, "int4 sep    lm8"),
        (4, True, 8, False, "int4 merged lm8"),
        (4, True, 4, False, "int4 merged lm4"),
        (4, True, 4, True, "int4 merged lm4 kv8"),
    ]
    for bits, merge, lm_bits, kv8, tag in configs:
        os.environ["ASR_LM_BITS"] = str(lm_bits)
        qp = quantize_decoder_params(params, bits=bits, merge=merge)
        cache = mk_cache(qp, kv8)
        tok = jnp.asarray([11], jnp.int32)
        np.asarray(loop(qp, cache, tok))  # compile + warm
        ts = []
        for _ in range(9):
            t0 = time.perf_counter()
            np.asarray(loop(qp, cache, tok))
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2]
        per_tok = (med - rtt) / STEPS * 1000
        print(
            f"{tag}: {per_tok:.3f} ms/token "
            f"device-side (raw {[round(t*1000,1) for t in ts]})"
        )


if __name__ == "__main__":
    main()
