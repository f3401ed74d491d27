"""Microbenchmark: weight-streaming matvec strategies on the real chip.

Runs each matvec 512x inside one jit'd scan so dispatch/tunnel overhead is
amortized; reports ns/iter and effective HBM bandwidth. Strategies:
  1. bf16 dense        x @ W_bf16
  2. XLA int8 dequant  x @ W_q.astype(bf16) * s  (fusion does the dequant)
  3. Pallas quant_matmul kernel
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench(fn, *args, iters=3):
    # NOTE: np.asarray, not block_until_ready — through the axon tunnel
    # only a host fetch actually synchronizes with device completion.
    _ = np.asarray(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.ops.pallas.quant_matmul import (
        quant_matmul, quantize_weight,
    )

    rng = np.random.default_rng(0)
    K, N, L = 1024, 3072, 28  # 28 distinct "layers" -> 176 MB bf16, must
    EPOCHS = 128              # stream from HBM every scan pass
    w = jnp.asarray(rng.standard_normal((L, K, N)) * 0.02, jnp.bfloat16)
    w_q, s = jax.vmap(quantize_weight)(w)
    s = s.astype(jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((8, K)) * 0.5, jnp.bfloat16)

    @jax.jit
    def loop_bf16(x, w):
        def epoch(c, _):
            def body(c, wl):
                y = c @ wl
                return c + y[:, :K] * 1e-9, None
            c, _ = jax.lax.scan(body, c, w)
            return c, None
        c, _ = jax.lax.scan(epoch, x, None, length=EPOCHS)
        return c

    @jax.jit
    def loop_int8_xla(x, w_q, s):
        def epoch(c, _):
            def body(c, xs):
                wl, sl = xs
                y = (c @ wl.astype(jnp.bfloat16)) * sl
                return c + y[:, :K] * 1e-9, None
            c, _ = jax.lax.scan(body, c, (w_q, s))
            return c, None
        c, _ = jax.lax.scan(epoch, x, None, length=EPOCHS)
        return c

    @jax.jit
    def loop_pallas(x, w_q, s):
        def epoch(c, _):
            def body(c, xs):
                wl, sl = xs
                y = quant_matmul(c, wl, sl, out_dtype=jnp.bfloat16)
                return c + y[:, :K] * 1e-9, None
            c, _ = jax.lax.scan(body, c, (w_q, s))
            return c, None
        c, _ = jax.lax.scan(epoch, x, None, length=EPOCHS)
        return c

    iters = L * EPOCHS
    bytes_bf16 = K * N * 2
    bytes_int8 = K * N + N * 2

    t = bench(loop_bf16, x, w) / iters
    print(f"bf16 dense:  {t*1e6:8.2f} us/it  {bytes_bf16/t/1e9:7.1f} GB/s")
    t = bench(loop_int8_xla, x, w_q, s) / iters
    print(f"int8 XLA:    {t*1e6:8.2f} us/it  {bytes_int8/t/1e9:7.1f} GB/s")
    t = bench(loop_pallas, x, w_q, s) / iters
    print(f"int8 pallas: {t*1e6:8.2f} us/it  {bytes_int8/t/1e9:7.1f} GB/s")


if __name__ == "__main__":
    main()
