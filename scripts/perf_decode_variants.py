"""A/B decode-step structures on the real chip.

Variant A (current): cache slabs threaded through lax.scan ys; attention
over the updated slab with a slot mask.
Variant B: scan emits only the fresh per-layer K/V; attention runs over
the stale slab + an explicit self-term; ONE dynamic_update_slice writes
all layers' fresh K/V after the scan.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.config import AsrConfig
    from qwen3_asr_rs_tpu.models.text_decoder import (
        KVCache, TextDecoder, init_decoder_params,
    )
    from qwen3_asr_rs_tpu.ops.norms import rms_norm
    from qwen3_asr_rs_tpu.ops.rotary import apply_rotary

    cfg = AsrConfig().text
    params = init_decoder_params(cfg, dtype=jnp.bfloat16)
    dec = TextDecoder(cfg, max_position=1024)
    S_MAX, P, STEPS = 577, 448, 128
    rng = np.random.default_rng(0)

    def loop_a(params, cache, tok):
        def cond(s):
            return s[2] < STEPS

        def body(s):
            cache, tok, i = s
            logits, cache = dec.decode_step(
                params, tok, jnp.int32(P) + i, cache
            )
            return cache, jnp.argmax(logits, -1).astype(jnp.int32), i + 1

        cache, tok, _ = jax.lax.while_loop(
            cond, body, (cache, tok, jnp.int32(0))
        )
        return tok

    # ---- variant B ----
    def decode_step_b(params, token_ids, pos, cache):
        b = token_ids.shape[0]
        hidden = dec.embed(params, token_ids)[:, None, :]
        cos, sin = dec.rotary.lookup(pos[None])
        nq, nkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                       cfg.head_dim)
        groups = nq // nkv
        slot = jnp.arange(S_MAX)
        kv_mask = (slot < pos)[None, None, None, :]  # stale slab validity

        def body(h, xs):
            layer, k_lay, v_lay = xs  # k_lay: (B, S, Hkv, D)
            residual = h
            x = rms_norm(h, layer["input_ln_w"], cfg.rms_norm_eps)
            q = (x @ layer["q_w"]).reshape(b, 1, nq, hd)
            k = (x @ layer["k_w"]).reshape(b, 1, nkv, hd)
            v = (x @ layer["v_w"]).reshape(b, 1, nkv, hd)
            q = rms_norm(q, layer["q_norm_w"], cfg.rms_norm_eps)
            k = rms_norm(k, layer["k_norm_w"], cfg.rms_norm_eps)
            q = apply_rotary(q, cos, sin)
            k = apply_rotary(k, cos, sin)

            qg = q.reshape(b, 1, nkv, groups, hd)
            sc = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k_lay,
                            preferred_element_type=jnp.float32)
            sc = sc * (hd ** -0.5)
            sc = jnp.where(kv_mask[:, :, None], sc, -1e9)
            s_self = jnp.einsum("bqhgd,bqhd->bhgq", qg, k.astype(q.dtype),
                                preferred_element_type=jnp.float32)[..., None]
            s_self = s_self * (hd ** -0.5)
            all_sc = jnp.concatenate([sc, s_self], -1)
            m = jnp.max(all_sc, -1, keepdims=True)
            p = jnp.exp(all_sc - m)
            denom = jnp.sum(p, -1, keepdims=True)
            p = p / denom
            out = jnp.einsum("bhgqk,bkhd->bqhgd", p[..., :-1].astype(v.dtype),
                             v_lay, preferred_element_type=jnp.float32)
            self_term = jnp.einsum(
                "bhgq,bqhd->bqhgd", p[..., -1], v.astype(q.dtype),
                preferred_element_type=jnp.float32,
            )
            out = out + self_term
            out = out.reshape(b, 1, nq * hd).astype(h.dtype)
            h = residual + out @ layer["o_w"]
            residual = h
            x = rms_norm(h, layer["post_ln_w"], cfg.rms_norm_eps)
            gate = jax.nn.silu(x @ layer["gate_w"])
            up = x @ layer["up_w"]
            h = residual + (gate * up) @ layer["down_w"]
            return h, (k[:, 0], v[:, 0])

        hidden, (ks, vs) = jax.lax.scan(
            body, hidden, (params["layers"], cache.k, cache.v)
        )
        cache_k = jax.lax.dynamic_update_slice(
            cache.k, ks[:, :, None].astype(cache.k.dtype), (0, 0, pos, 0, 0)
        )
        cache_v = jax.lax.dynamic_update_slice(
            cache.v, vs[:, :, None].astype(cache.v.dtype), (0, 0, pos, 0, 0)
        )
        logits = dec.logits(params, hidden)
        return logits[:, 0], KVCache(k=cache_k, v=cache_v)

    def loop_b(params, cache, tok):
        def cond(s):
            return s[2] < STEPS

        def body(s):
            cache, tok, i = s
            logits, cache = decode_step_b(
                params, tok, jnp.int32(P) + i, cache
            )
            return cache, jnp.argmax(logits, -1).astype(jnp.int32), i + 1

        cache, tok, _ = jax.lax.while_loop(
            cond, body, (cache, tok, jnp.int32(0))
        )
        return tok

    cache = KVCache.zeros(cfg, 1, S_MAX, dtype=jnp.bfloat16)
    k0 = jnp.asarray(
        rng.standard_normal(cache.k.shape) * 0.1, jnp.bfloat16
    )
    cache = KVCache(k=k0, v=k0)
    tok = jnp.asarray([17], jnp.int32)

    for name, fn in (("A (slab through scan)", loop_a),
                     ("B (fresh-kv + single DUS)", loop_b)):
        j = jax.jit(fn)
        _ = np.asarray(j(params, cache, tok))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(j(params, cache, tok))
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[1]
        print(f"{name}: {med*1000:.1f} ms total, "
              f"{med/STEPS*1000:.3f} ms/token")


if __name__ == "__main__":
    main()
