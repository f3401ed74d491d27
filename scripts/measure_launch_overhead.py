"""Measure the per-pallas_call launch overhead on the current backend.

The decode-attention dispatch crossover (TextDecoder.decode_attn_threshold)
scales with how much a single pallas_call launch costs: ~37 us through the
tunneled v5e in this environment, much less on directly-attached hardware.
Run this once per deployment and export the result:

    python scripts/measure_launch_overhead.py
    export ASR_PALLAS_LAUNCH_US=<printed value>

Method: time a jitted chain of N trivial Pallas kernel calls (each
data-dependent on the previous, so they cannot overlap) against the same
chain of pure-XLA ops, and attribute the difference to launch overhead.
Results are fetched to host with np.asarray because block_until_ready does
not synchronize through the tunnel.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _tiny_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0


def _pallas_step(x):
    return pl.pallas_call(
        _tiny_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


def _xla_step(x):
    return x + 1.0


def _time_chain(step, n_calls: int, reps: int = 10) -> float:
    @jax.jit
    def chain(x):
        for _ in range(n_calls):
            x = step(x)
        return x

    x = jnp.zeros((8, 128), jnp.float32)
    np.asarray(chain(x))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(chain(x))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    n_calls = 64
    print(f"backend: {jax.default_backend()}, chain of {n_calls} calls")
    t_pallas = _time_chain(_pallas_step, n_calls)
    t_xla = _time_chain(_xla_step, n_calls)
    per_launch_us = max(0.1, (t_pallas - t_xla) / n_calls * 1e6)
    print(f"pallas chain: {t_pallas * 1e3:.2f} ms, xla chain: {t_xla * 1e3:.2f} ms")
    print(f"per-launch overhead: {per_launch_us:.1f} us")
    print(f"export ASR_PALLAS_LAUNCH_US={per_launch_us:.1f}")

    from qwen3_asr_rs_tpu.models.text_decoder import TextDecoder

    import os

    os.environ["ASR_PALLAS_LAUNCH_US"] = f"{per_launch_us:.1f}"
    print(f"derived decode-attn threshold: {TextDecoder.decode_attn_threshold()}")


if __name__ == "__main__":
    main()
