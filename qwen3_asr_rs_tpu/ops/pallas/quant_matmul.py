"""Weight-only int8 matmul (Pallas/Mosaic TPU kernel).

Computes ``y = x @ (w_q * s)`` where ``w_q`` is int8 with per-output-channel
scales ``s`` — streaming HALF the bytes of a bf16 weight matrix out of HBM.
Greedy decode on this model is weight-bandwidth-bound (every token reads
every decoder weight once), so this kernel is the main single-stream decode
accelerator.

The dequantization happens in VMEM on the VPU right before the MXU dot;
the f32 accumulator lives in VMEM scratch across the k-dimension grid.
Scales are applied once per (k==last) tile since they are per-output-column:
``sum_k x_k q_kj * s_j == s_j * sum_k x_k q_kj``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _qmm_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Dequantize to bf16, not f32: int8 values are exactly representable
    # in bf16 and the MXU runs bf16 inputs at full rate (f32 inputs cost
    # ~4x the passes). Accumulation stays f32.
    x = x_ref[:]
    w = w_ref[:].astype(jnp.bfloat16)
    acc_ref[:] += jax.lax.dot_general(
        x.astype(jnp.bfloat16), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == n_k - 1)
    def _finish():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)).astype(
            o_ref.dtype
        )


@functools.partial(
    jax.jit,
    static_argnames=("block_out", "block_in", "out_dtype", "interpret"),
)
def quant_matmul(
    x,       # (R, K) float
    w_q,     # (K, N) int8
    scales,  # (N,) float
    *,
    block_out: int = 512,
    block_in: int = 512,
    out_dtype=None,
    interpret: bool = False,
):
    r, k = x.shape
    _, n = w_q.shape
    if out_dtype is None:
        out_dtype = x.dtype
    block_in = min(block_in, k)
    block_out = min(block_out, n)
    n_k = pl.cdiv(k, block_in)
    n_n = pl.cdiv(n, block_out)

    return pl.pallas_call(
        functools.partial(_qmm_kernel, n_k=n_k),
        grid=(n_n, n_k),
        in_specs=[
            pl.BlockSpec((r, block_in), lambda ni, ki: (0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_in, block_out), lambda ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_out), lambda ni, ki: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, block_out), lambda ni, ki: (0, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((r, block_out), jnp.float32)],
        interpret=interpret,
    )(x, w_q, scales.reshape(1, -1))


def quantize_weight(w, axis: int = 0):
    """Per-output-channel symmetric int8 quantization of (K, N) weights.

    Returns (w_q int8 (K, N), scales f32 (N,)). axis is the contraction
    axis (0 for (in, out) layout).
    """
    wf = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=axis)  # (N,)
    scales = jnp.maximum(absmax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(wf / scales[None, :]), -127, 127).astype(
        jnp.int8
    )
    return w_q, scales


def dequantize(w_q, scales):
    return w_q.astype(jnp.float32) * scales[None, :]


# ---------------------------------------------------------------------- #
# int4 (nibble-packed): this JAX build's native jnp.int4 arrays are broken
# (device_put recursion) and Mosaic rejects int8 shifts, so int4 weights
# are packed two-per-int8 and unpacked with int32 arithmetic shifts —
# verified exact on TPU. Packed column j holds original columns
# (j, j + N/2) in its (low, high) nibble, so unpacking is two shifts plus
# a lane-dimension concat: no permutation, MXU-friendly halves.
# ---------------------------------------------------------------------- #


def quantize_weight_int4(w, axis: int = 0):
    """Per-output-channel symmetric int4 quantization of (K, N) weights.

    Returns (packed int8 (K, N//2), scales f32 (N,)). Values are clipped
    to [-7, 7] (symmetric; -8 unused). N must be even.
    """
    wf = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=axis)  # (N,)
    scales = jnp.maximum(absmax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wf / scales[None, :]), -7, 7).astype(jnp.int8)
    n = q.shape[1]
    if n % 2:
        raise ValueError(f"int4 packing needs an even output dim, got {n}")
    lo, hi = q[:, : n // 2], q[:, n // 2 :]
    packed = ((lo & jnp.int8(0xF)) | (hi << 4)).astype(jnp.int8)
    return packed, scales


def unpack_int4(packed, dtype=jnp.float32):
    """Inverse of the packing in quantize_weight_int4 (original col order).

    Arithmetic int32 shifts sign-extend both nibbles exactly; works under
    XLA and inside Mosaic kernels (int8 shifts do not lower on TPU).
    """
    p = packed.astype(jnp.int32)
    lo = (p << 28) >> 28  # low nibble, sign-extended
    hi = p >> 4           # high nibble (arithmetic shift of the byte)
    return jnp.concatenate([lo, hi], axis=-1).astype(dtype)
