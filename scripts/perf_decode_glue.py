"""Decompose the decode step: megakernel vs the XLA glue around it.

Variants, each a 128-iteration on-device loop (RTT-corrected):
  full       decode_step_token: embed + rope + megakernel + slab write
             + lm_head matvec + argmax + loop bookkeeping
  kernel     decode_layers_fused only (hidden fed back as next input)
  kernel_lm  + lm_head matvec + argmax (token summed into the carry)
  kernel_kv  + the _write_token_kv slab write

full - kernel_lm - (kernel_kv - kernel) ~ embed/rope/bookkeeping cost;
kernel_lm - kernel = lm head cost; kernel_kv - kernel = slab-write cost.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STEPS = 128
S_MAX, P = 704, 448


def rtt_s():
    import jax.numpy as jnp

    x = jnp.zeros((8,), jnp.int32)
    _ = np.asarray(x)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(x + 1)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def build(quantize):
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.config import AsrConfig
    from qwen3_asr_rs_tpu.models.text_decoder import (
        KVCache, TextDecoder, init_decoder_params,
    )

    cfg = AsrConfig().text
    params = init_decoder_params(cfg, dtype=jnp.bfloat16)
    if quantize:
        from qwen3_asr_rs_tpu.weights.quantize import quantize_decoder_params

        params = quantize_decoder_params(
            params, bits=8 if quantize == "int8" else 4
        )
    dec = TextDecoder(cfg, max_position=1024)
    rng = np.random.default_rng(0)
    cache = KVCache.zeros(cfg, 1, S_MAX, dtype=jnp.bfloat16)
    cache = KVCache(
        k=jnp.asarray(rng.standard_normal(cache.k.shape) * 0.1,
                      jnp.bfloat16),
        v=jnp.asarray(rng.standard_normal(cache.v.shape) * 0.1,
                      jnp.bfloat16),
    )
    return cfg, params, dec, cache


def measure(loop, args):
    import jax

    _ = np.asarray(jax.jit(loop)(*args))
    base = rtt_s()
    f = jax.jit(loop)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(f(*args))
        ts.append(time.perf_counter() - t0)
    return (min(ts) - base) / STEPS * 1000


def run(quantize):
    import jax
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.ops.pallas.decode_layer import decode_layers_fused

    cfg, params, dec, cache = build(quantize)
    eps = cfg.rms_norm_eps
    h0 = jnp.zeros((1, cfg.hidden_size), jnp.bfloat16) + 0.01
    cos, sin = dec.rotary.lookup(jnp.asarray([P], jnp.int32))
    cosb = jnp.broadcast_to(cos, (1, cos.shape[-1]))
    sinb = jnp.broadcast_to(sin, (1, sin.shape[-1]))
    pos = jnp.int32(P)

    def full(params, cache, tok):
        def body(s):
            cache, tok, i = s
            tok, cache = dec.decode_step_token(params, tok, pos + i, cache)
            return cache, tok, i + 1

        _, tok, _ = jax.lax.while_loop(
            lambda s: s[2] < STEPS, body, (cache, tok, jnp.int32(0))
        )
        return tok

    def kernel(params, cache, h):
        def body(s):
            h, i = s
            h2, ks, vs = decode_layers_fused(
                h, cosb, sinb, params["layers"], cache.k, cache.v,
                None, pos, eps=eps, interpret=False,
            )
            # keep ks/vs live without a slab write
            h2 = h2 + ks[0, :, 0, :1].astype(h2.dtype) * 1e-6
            h2 = h2 + vs[0, :, 0, :1].astype(h2.dtype) * 1e-6
            return h2, i + 1

        h, _ = jax.lax.while_loop(
            lambda s: s[1] < STEPS, body, (h, jnp.int32(0))
        )
        return h

    def kernel_lm(params, cache, h):
        def body(s):
            h, acc, i = s
            h2, ks, vs = decode_layers_fused(
                h, cosb, sinb, params["layers"], cache.k, cache.v,
                None, pos, eps=eps, interpret=False,
            )
            logits = dec.logits(params, h2[:, None])[:, 0]
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            h2 = h2 + ks[0, :, 0, :1].astype(h2.dtype) * 1e-6
            return h2, acc + tok, i + 1

        h, acc, _ = jax.lax.while_loop(
            lambda s: s[2] < STEPS, body, (h, jnp.zeros(1, jnp.int32),
                                           jnp.int32(0))
        )
        return acc

    def kernel_kv(params, cache, h):
        def body(s):
            h, cache, i = s
            h2, ks, vs = decode_layers_fused(
                h, cosb, sinb, params["layers"], cache.k, cache.v,
                None, pos, eps=eps, interpret=False,
            )
            cache = dec._write_token_kv(cache, ks, vs, pos + i)
            return h2, cache, i + 1

        h, _, _ = jax.lax.while_loop(
            lambda s: s[2] < STEPS, body, (h, cache, jnp.int32(0))
        )
        return h

    label = quantize or "bf16"
    tok0 = jnp.asarray([42], jnp.int32)
    out = {}
    out["full"] = measure(full, (params, cache, tok0))
    out["kernel"] = measure(kernel, (params, cache, h0))
    out["kernel_lm"] = measure(kernel_lm, (params, cache, h0))
    out["kernel_kv"] = measure(kernel_kv, (params, cache, h0))
    print(
        f"{label:5s}: full {out['full']:.3f} | kernel {out['kernel']:.3f}"
        f" | +lm {out['kernel_lm']:.3f} | +kv {out['kernel_kv']:.3f}"
        f"  -> lm {out['kernel_lm']-out['kernel']:.3f}, "
        f"kv {out['kernel_kv']-out['kernel']:.3f}, "
        f"embed/rope/book {out['full']-out['kernel_lm']-(out['kernel_kv']-out['kernel']):.3f}"
        " ms/token"
    )
    return out


def main():
    for q in (None, "int8", "int4"):
        run(q)


if __name__ == "__main__":
    main()
