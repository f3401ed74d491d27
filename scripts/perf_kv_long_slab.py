"""int8-KV vs bf16-KV decode at the 4096-token-cap slab size, on chip.

Round-5 target (VERDICT #3): before the DMA decode-attention kernel
grew an int8-KV path, quantized KV forced `impl="dense"` — every decode
step read the ENTIRE slab — precisely in the big-slab regime (s_max ~
4800 at the 4096 cap) where halving slab bytes matters most. This
measures all four (kv dtype x attention impl) combinations at a long
live length so the new kernel path can be judged against both the bf16
kernel path and the old dense fallback.

Timing follows NOTES.md methodology: N steps inside one jitted
while_loop, one host fetch; the tunnel RTT embedded in the fetch is
calibrated with a no-op jit and subtracted.

Usage: python scripts/perf_kv_long_slab.py [quick]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

QUICK = len(sys.argv) > 1 and sys.argv[1] == "quick"
STEPS = 32 if QUICK else 64
S_MAX = 4864          # 128-aligned (int8-KV scale slabs lane-slice)
LIVE = 4600           # live tokens already in the slab
ITERS = 2 if QUICK else 4


def main():
    import jax
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.config import AsrConfig
    from qwen3_asr_rs_tpu.models.text_decoder import (
        KVCache, TextDecoder, init_decoder_params,
    )

    print(f"devices: {jax.devices()}")
    cfg = AsrConfig().text
    params = init_decoder_params(cfg, dtype=jnp.bfloat16)
    dec = TextDecoder(cfg, max_position=S_MAX + STEPS + 8)
    rng = np.random.default_rng(0)

    def make_cache(quantized: bool) -> KVCache:
        shape = (
            cfg.num_hidden_layers, 1, cfg.num_key_value_heads, S_MAX,
            cfg.head_dim,
        )
        if quantized:
            k = jnp.asarray(rng.integers(-127, 128, shape), jnp.int8)
            v = jnp.asarray(rng.integers(-127, 128, shape), jnp.int8)
            s = jnp.asarray(
                rng.uniform(0.001, 0.01, shape[:-1]), jnp.float32
            )
            return KVCache(k=k, v=v, k_scale=s, v_scale=s)
        k = jnp.asarray(rng.standard_normal(shape) * 0.3, jnp.bfloat16)
        return KVCache(k=k, v=k)

    def make_loop(live):
        # fresh closure per env setting: the impl dispatch reads the env
        # at trace time, so each variant jits its own copy
        def loop(params, cache, tok):
            def cond(s):
                return s[2] < STEPS

            def body(s):
                cache, tok, i = s
                logits, cache = dec.decode_step(
                    params, tok, jnp.int32(live) + i, cache
                )
                return (
                    cache, jnp.argmax(logits, -1).astype(jnp.int32), i + 1
                )

            cache, tok, _ = jax.lax.while_loop(
                cond, body, (cache, tok, jnp.int32(0))
            )
            return tok

        return jax.jit(loop)

    noop = jax.jit(lambda x: x + 1)
    _ = np.asarray(noop(jnp.int32(0)))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(noop(jnp.int32(1)))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[2]
    print(f"calibrated fetch RTT: {rtt*1000:.1f} ms")

    os.environ["ASR_DECODE_IMPL"] = "scan"  # isolate the attention path
    tok = jnp.asarray([17], jnp.int32)
    results = {}
    for kv in ("bf16", "int8"):
        cache = make_cache(kv == "int8")
        for impl in ("kernel", "dense"):
            os.environ["ASR_DECODE_ATTN"] = impl
            for live in (LIVE, 1024):
                # live < s_max is the serving-pool reality: the slab is
                # sized for the cap, most requests are far shorter; the
                # DMA kernel only reads live blocks, dense reads s_max
                j = make_loop(live)
                _ = np.asarray(j(params, cache, tok))  # compile
                ts = []
                for _ in range(ITERS):
                    t0 = time.perf_counter()
                    _ = np.asarray(j(params, cache, tok))
                    ts.append(time.perf_counter() - t0)
                med = sorted(ts)[len(ts) // 2] - rtt
                ms_tok = med / STEPS * 1000
                results[(kv, impl, live)] = ms_tok
                print(
                    f"kv={kv:4s} attn={impl:6s} live={live:4d}: "
                    f"{med*1000:7.1f} ms total, {ms_tok:6.3f} ms/token"
                    f"  (s_max={S_MAX})"
                )

    for live in (LIVE, 1024):
        new = results[("int8", "kernel", live)]
        old = results[("int8", "dense", live)]
        base = results[("bf16", "kernel", live)]
        print(
            f"live={live}: int8-KV kernel vs old dense fallback "
            f"{old/new:.2f}x; vs bf16-KV kernel {base/new:.2f}x"
        )


if __name__ == "__main__":
    main()
