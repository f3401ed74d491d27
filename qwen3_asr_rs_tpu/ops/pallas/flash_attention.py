"""Fused flash attention (Pallas/Mosaic TPU kernel).

Online-softmax attention that never materializes the (Sq, Sk) score
matrix in HBM. Supports the two mask structures the ASR models need:

  * ``causal``   — decoder prefill (query i attends keys <= i)
  * ``kv_valid`` — per-batch key-prefix validity count (encoder window
    padding; decode slot limit)

GQA is handled by mapping query head h onto kv head h // (Hq // Hkv) in
the index maps — repeated K/V are never materialized.

Grid: (batch, q_heads, q_blocks, k_blocks), with the k dimension innermost
and the running max / denominator / accumulator carried in VMEM scratch
across k iterations (the standard TPU flash pattern: init at k==0, write
out at k==last). Masking uses a large-negative finite constant so padded
rows stay NaN-free (matching ops/attention.py::MASK_VALUE semantics).

Tuning (round 5, measured on v5e at 0.6B decoder-prefill shapes —
B=1, 16Q/8KV, D=128, bf16, causal; scripts/perf_flash_tune.py):
  * the QK dot runs in the INPUT dtype with f32 accumulation — a prior
    .astype(f32) before the dot forced multi-pass f32 MXU matmuls and
    was the main reason dense XLA used to win every prefill length;
  * default blocks are 256x512 (was 128x128): best-or-tied at every
    length >= 4k in two independent sweeps. With both changes flash is
    ~parity with dense at 4k tokens and wins 1.07-1.14x at 6k-9k (the
    240/360-chunk long-form prefills) while still never materializing
    the score matrix (dense at 9k builds a 5 GB f32 score tensor).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -1e9
INIT_M = -1e30


def _flash_kernel(
    # scalar prefetch
    kv_valid_ref,   # (B,) int32: keys >= kv_valid[b] masked
    kv_start_ref,   # (B,) int32: keys <  kv_start[b] masked (left padding)
    # inputs
    q_ref,  # (BQ, D)
    k_ref,  # (BK, D)
    v_ref,  # (BK, D)
    # outputs
    o_ref,  # (BQ, D)
    # scratch
    m_scr,  # (BQ, 1) f32
    l_scr,  # (BQ, 1) f32
    acc_scr,  # (BQ, D) f32
    *,
    scale: float,
    causal: bool,
    use_kv_valid: bool,
    use_kv_start: bool,
    block_q: int,
    block_k: int,
    sk: int,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, INIT_M)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def _block():
        # QK dot in the INPUT dtype with f32 accumulation: on bf16
        # activations the MXU runs at native bf16 throughput (a prior
        # .astype(f32) here forced multi-pass f32 matmuls, ~3x slower
        # and the main reason dense XLA — which also contracts bf16
        # with preferred_element_type=f32 — used to win every prefill
        # measurement; PERFORMANCE.md round 5)
        s = jax.lax.dot_general(
            q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BQ, BK) f32

        col = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        # always mask key padding beyond Sk (the last k block may
        # overhang)
        mask_bad = col >= sk
        if use_kv_valid:
            mask_bad = jnp.logical_or(mask_bad, col >= kv_valid_ref[b])
        if use_kv_start:
            mask_bad = jnp.logical_or(mask_bad, col < kv_start_ref[b])
        if causal:
            row = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            mask_bad = jnp.logical_or(mask_bad, col > row)
        s = jnp.where(mask_bad, MASK_VALUE, s)

        m_prev = m_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_scr[:] = l_scr[:] * corr + jnp.sum(p, axis=1, keepdims=True)
        # zero out-of-bounds V rows (the last k block may overhang Sk
        # and its padding reads are undefined; 0 * garbage would poison
        # the matmul)
        krow = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, 1), 0
        )
        v_blk = jnp.where(krow < sk, v_ref[:], 0)
        acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = m_new

    if causal:
        # skip k blocks wholly above the diagonal (the index map also
        # clamps their DMA to a live block): ~2x less prefill work
        pl.when(ki * block_k <= qi * block_q + block_q - 1)(_block)
    else:
        _block()

    @pl.when(ki == nk - 1)
    def _finish():
        o_ref[:] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(
            o_ref.dtype
        )


def _kv_block(qi, ki, causal, block_q, block_k):
    if not causal:
        return ki
    # clamp dead above-diagonal blocks onto the last live block: Pallas
    # re-addresses it without a fresh DMA and the kernel skips compute
    last_live = (qi * block_q + block_q - 1) // block_k
    return jnp.minimum(ki, last_live)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_k", "interpret"),
)
def flash_attention(
    q,  # (B, Sq, Hq, D)
    k,  # (B, Sk, Hkv, D)
    v,  # (B, Sk, Hkv, D)
    kv_valid=None,  # (B,) int32 or None
    kv_start=None,  # (B,) int32 or None — left-padding offset per example
    *,
    causal: bool = False,
    scale: float | None = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
):
    batch, sq, hq, d = q.shape
    _, sk, hkv, _ = k.shape
    groups = hq // hkv
    if scale is None:
        scale = d ** -0.5
    block_q = min(block_q, max(8, sq))
    block_k = min(block_k, max(8, sk))
    nq = pl.cdiv(sq, block_q)
    nk = pl.cdiv(sk, block_k)

    use_kv_valid = kv_valid is not None
    if kv_valid is None:
        kv_valid = jnp.full((batch,), sk, jnp.int32)
    kv_valid = kv_valid.astype(jnp.int32)
    use_kv_start = kv_start is not None
    if kv_start is None:
        kv_start = jnp.zeros((batch,), jnp.int32)
    kv_start = kv_start.astype(jnp.int32)

    kernel = functools.partial(
        _flash_kernel,
        scale=scale,
        causal=causal,
        use_kv_valid=use_kv_valid,
        use_kv_start=use_kv_start,
        block_q=block_q,
        block_k=block_k,
        sk=sk,
    )

    # TPU blocking wants (seq, head_dim) as the trailing dims; heads move
    # to the grid. The transposes are tiny next to the attention itself.
    qt = q.transpose(0, 2, 1, 3)  # (B, Hq, Sq, D)
    kt = k.transpose(0, 2, 1, 3)  # (B, Hkv, Sk, D)
    vt = v.transpose(0, 2, 1, 3)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, hq, nq, nk),
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d),
                # trailing arg: the scalar-prefetch ref
                lambda b, h, qi, ki, *_: (b, h, qi, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_k, d),
                lambda b, h, qi, ki, *_, g=groups: (
                    b, h // g, _kv_block(qi, ki, causal, block_q, block_k),
                    0,
                ),
            ),
            pl.BlockSpec(
                (1, 1, block_k, d),
                lambda b, h, qi, ki, *_, g=groups: (
                    b, h // g, _kv_block(qi, ki, causal, block_q, block_k),
                    0,
                ),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d),
            lambda b, h, qi, ki, *_: (b, h, qi, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )

    def kernel_sq(kv_valid_ref, kv_start_ref, q_ref, k_ref, v_ref, o_ref,
                  m, l, acc):
        # squeeze the unit batch/head block dims
        kernel(
            kv_valid_ref,
            kv_start_ref,
            q_ref.at[0, 0],
            k_ref.at[0, 0],
            v_ref.at[0, 0],
            o_ref.at[0, 0],
            m, l, acc,
        )

    out = pl.pallas_call(
        kernel_sq,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, hq, sq, d), q.dtype),
        interpret=interpret,
    )(kv_valid, kv_start, qt, kt, vt)
    return out.transpose(0, 2, 1, 3)
