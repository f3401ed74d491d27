"""Ablate the batched (B=8) decode step to locate the cost."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(B=8, STEPS=64):
    import jax
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.config import AsrConfig
    from qwen3_asr_rs_tpu.models.text_decoder import (
        KVCache, TextDecoder, init_decoder_params,
    )
    from qwen3_asr_rs_tpu.ops.norms import rms_norm

    cfg = AsrConfig().text
    params = init_decoder_params(cfg, dtype=jnp.bfloat16)
    dec = TextDecoder(cfg, max_position=1024)
    S_MAX, P = 577, 448
    rng = np.random.default_rng(0)
    kv_start = jnp.zeros((B,), jnp.int32)

    cache = KVCache.zeros(cfg, B, S_MAX, dtype=jnp.bfloat16)
    cache = KVCache(
        k=jnp.asarray(rng.standard_normal(cache.k.shape) * 0.1, jnp.bfloat16),
        v=jnp.asarray(rng.standard_normal(cache.v.shape) * 0.1, jnp.bfloat16),
    )
    tok = jnp.asarray([17] * B, jnp.int32)

    def bench(fn):
        j = jax.jit(fn)
        _ = np.asarray(j(params, cache, tok))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(j(params, cache, tok))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1] / STEPS * 1000

    def full(params, cache, tok):
        def cond(s):
            return s[2] < STEPS

        def body(s):
            cache, tok, i = s
            logits, cache = dec.decode_step_aligned(
                params, tok, jnp.int32(P) + i, kv_start, cache
            )
            return cache, jnp.argmax(logits, -1).astype(jnp.int32), i + 1

        cache, tok, _ = jax.lax.while_loop(cond, body, (cache, tok,
                                                        jnp.int32(0)))
        return tok

    def no_logits(params, cache, tok):
        def cond(s):
            return s[2] < STEPS

        def body(s):
            cache, tok, i = s
            hidden = dec.embed(params, tok)[:, None, :]
            pos = (jnp.int32(P) + i - kv_start)[:, None]
            cos, sin = dec.rotary.lookup_batch(pos)
            slot_idx = jnp.arange(S_MAX)[None, :]
            live = (slot_idx >= kv_start[:, None]) & (
                slot_idx < jnp.int32(P) + i
            )

            def lbody(h, xs):
                layer, k_lay, v_lay = xs
                h, kf, vf = dec._decode_layer_masked(
                    layer, h, cos, sin, k_lay, v_lay, live
                )
                return h, (kf, vf)

            hidden, (ks, vs) = jax.lax.scan(
                lbody, hidden, (params["layers"], cache.k, cache.v)
            )
            k_new = jax.lax.dynamic_update_slice(
                cache.k, ks[:, :, None].astype(cache.k.dtype),
                (0, 0, jnp.int32(P) + i, 0, 0),
            )
            cache = KVCache(k=k_new, v=cache.v)
            tok = (jnp.sum(hidden, (1, 2)) * 0).astype(jnp.int32) + 17
            return cache, tok, i + 1

        cache, tok, _ = jax.lax.while_loop(cond, body, (cache, tok,
                                                        jnp.int32(0)))
        return tok

    def weights_only(params, cache, tok):
        """7 matvecs per layer only — pure streaming floor."""
        def cond(s):
            return s[2] < STEPS

        def body(s):
            cache, tok, i = s
            h = dec.embed(params, tok)[:, None, :]

            def lbody(h, layer):
                x = rms_norm(h, layer["input_ln_w"], cfg.rms_norm_eps)
                q = x @ layer["q_w"]
                k = x @ layer["k_w"]
                v = x @ layer["v_w"]
                o = (q[..., : cfg.hidden_size * 2].reshape(
                    h.shape[0], 1, -1)[..., : layer["o_w"].shape[0]]
                ) @ layer["o_w"]
                g = jax.nn.silu(x @ layer["gate_w"])
                u = x @ layer["up_w"]
                d = (g * u) @ layer["down_w"]
                return h + o + d + jnp.sum(k) * 0 + jnp.sum(v) * 0, None

            h, _ = jax.lax.scan(lbody, h, params["layers"])
            logits = dec.logits(params, h)
            tok = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
            return cache, tok, i + 1

        cache, tok, _ = jax.lax.while_loop(cond, body, (cache, tok,
                                                        jnp.int32(0)))
        return tok

    print(f"B={B}:", file=sys.stderr)
    print(f"  full step:        {bench(full):.3f} ms/step")
    print(f"  no logits/argmax: {bench(no_logits):.3f} ms/step")
    print(f"  weights only:     {bench(weights_only):.3f} ms/step")


if __name__ == "__main__":
    main()
