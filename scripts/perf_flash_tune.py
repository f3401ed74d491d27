"""Flash-attention prefill kernel tuning sweep, on chip.

Round-5 target (VERDICT #7): the flash kernel lost to dense XLA at
every measured prefill length (dense/flash ms at 512/1024/2048/3072:
5.4/8.5, 12.2/24.8, 46/73, 95/147 — round 3c) and survived only as a
>4k-token OOM guard — but it had never had a tuning round. Two knobs:

  * in-kernel QK dot dtype — the kernel used to .astype(f32) q/k before
    the dot, forcing multi-pass f32 MXU matmuls; bf16 inputs with
    preferred_element_type=f32 run at native MXU throughput (this is
    exactly what the dense path's einsum does);
  * block_q x block_k — 128x128 default vs larger tiles (fewer grid
    steps, more VMEM per step).

Measures CAUSAL prefill (the decoder shape: the 240/360-chunk long-form
buckets prefill up to ~9k tokens) at 0.6B dims, B=1, 16Q/8KV, D=128,
bf16, against the dense XLA path at the same shape.

Timing: M back-to-back applications chained inside one jit (output
feeds a dummy dependency into the next call so XLA can't elide), ONE
host fetch, calibrated no-op RTT subtracted (NOTES.md methodology).

Usage: python scripts/perf_flash_tune.py [quick]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

QUICK = len(sys.argv) > 1 and sys.argv[1] == "quick"
LENGTHS = (2048, 4096) if QUICK else (2048, 4096, 6144, 9216)
BLOCKS = ((128, 128), (256, 256)) if QUICK else (
    (128, 128), (128, 256), (256, 256), (256, 512), (512, 512),
    (512, 1024),
)
M = 4          # chained applications per timed fetch
ITERS = 3
HQ, HKV, D = 16, 8, 128


def main():
    import jax
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.ops.attention import attention
    from qwen3_asr_rs_tpu.ops.pallas.flash_attention import flash_attention

    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    noop = jax.jit(lambda x: x + 1)
    _ = np.asarray(noop(jnp.int32(0)))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(noop(jnp.int32(1)))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[2]
    print(f"calibrated fetch RTT: {rtt*1000:.1f} ms")

    def chain(fn):
        # M applications with a serial data dependency (q += eps * out)
        def run(q, k, v):
            def body(i, q):
                out = fn(q, k, v)
                return q + (out * 1e-6).astype(q.dtype)

            return jax.lax.fori_loop(0, M, body, q)

        return jax.jit(run)

    def timed(j, q, k, v):
        _ = np.asarray(j(q, k, v))  # compile + warm
        ts = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            _ = np.asarray(j(q, k, v))
            ts.append(time.perf_counter() - t0)
        return (sorted(ts)[len(ts) // 2] - rtt) / M * 1000  # ms/call

    table = {}
    for s in LENGTHS:
        q = jnp.asarray(
            rng.standard_normal((1, s, HQ, D)) * 0.3, jnp.bfloat16
        )
        k = jnp.asarray(
            rng.standard_normal((1, s, HKV, D)) * 0.3, jnp.bfloat16
        )
        v = jnp.asarray(
            rng.standard_normal((1, s, HKV, D)) * 0.3, jnp.bfloat16
        )

        try:
            dense_ms = timed(
                chain(lambda q, k, v: attention(
                    q, k, v, causal=True, impl="dense"
                )), q, k, v,
            )
        except Exception as e:  # noqa: BLE001 — dense OOMs past ~9k
            print(f"S={s}: dense failed ({type(e).__name__})")
            dense_ms = float("inf")
        table[(s, "dense")] = dense_ms
        print(f"S={s}: dense {dense_ms:8.2f} ms")

        for bq, bk in BLOCKS:
            if bq > s or bk > s:
                continue
            try:
                ms = timed(
                    chain(lambda q, k, v, bq=bq, bk=bk: flash_attention(
                        q, k, v, causal=True, block_q=bq, block_k=bk
                    )), q, k, v,
                )
            except Exception as e:  # noqa: BLE001 — VMEM overflow
                print(f"S={s}: flash {bq}x{bk} failed "
                      f"({type(e).__name__}: {str(e)[:80]})")
                continue
            table[(s, (bq, bk))] = ms
            tag = "WIN " if ms < dense_ms else "    "
            print(f"S={s}: flash bq={bq:4d} bk={bk:4d} {ms:8.2f} ms "
                  f"{tag}({dense_ms/ms:.2f}x vs dense)")

    print("\nbest per length:")
    for s in LENGTHS:
        flash = {
            kk: v for kk, v in table.items()
            if kk[0] == s and kk[1] != "dense"
        }
        if not flash:
            continue
        best = min(flash.items(), key=lambda kv: kv[1])
        print(
            f"  S={s}: best flash {best[0][1]} {best[1]:.2f} ms, "
            f"dense {table[(s, 'dense')]:.2f} ms -> "
            f"{table[(s, 'dense')]/best[1]:.2f}x"
        )


if __name__ == "__main__":
    main()
