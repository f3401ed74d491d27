"""Fused GQA decode attention over the KV slab (Pallas/Mosaic TPU).

One decode step attends a single query token against the cache slab plus
the freshly-computed self K/V. Two properties make this a kernel instead
of einsums:

  * **Dead-block skipping.** The slab is sized for the generation cap
    (prompt + max_new_tokens, e.g. ~4700 slots at the reference's 4096
    cap) but only `end` slots are live. XLA reads the whole slab every
    step; here the block index map CLAMPS past the last live block, so
    Pallas re-addresses the same block (no new DMA) and the body skips —
    decode attention cost scales with the LIVE length, not the cap.
  * **No scan-slice copies.** The kernel takes the full stacked
    (L, B, Hkv, S, D) slab plus the layer index as a scalar-prefetch
    argument, so calling it inside the `lax.scan` over layers does not
    slice (slicing a scanned operand into a custom call materializes a
    copy of the whole layer slab).

The slab layout keeps the KV-head dim OUTSIDE the slot dim so one
batched `dot_general` covers every head (Mosaic lowers batched dots
natively; measured ~18x faster than a per-head loop at B=1, S=704).

Semantics (identical to the dense path in text_decoder._decode_layer_masked):
  out[b,h] = softmax_k([scores(q_bh, K[l, b, :, start_b:end_b]),
                        score(q_bh, k_self_b)]) @ [V; v_self]
with Hq = G * Hkv query heads grouped onto kv heads.

All in-kernel dots run in f32 — the kernel is HBM-bound, and Mosaic (this
jax version) miscompiles mixed bf16->f32 accumulation here
('vector.broadcast' verification error).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -1e9
INIT_M = -1e30


def _scores(q, k, hkv, groups, bs):
    """Batched GQA scores: q (Hq, D) x k (Hkv, BS, D) -> (Hq, BS) f32."""
    d = q.shape[-1]
    qg = q.reshape(hkv, groups, d)
    return jax.lax.dot_general(
        qg, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(hkv * groups, bs)


def _weighted_v(p, v, hkv, groups, bs):
    """Batched GQA p@V: p (Hq, BS) x v (Hkv, BS, D) -> (Hq, D) f32."""
    d = v.shape[-1]
    pg = p.reshape(hkv, groups, bs)
    return jax.lax.dot_general(
        pg, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(hkv * groups, d)


def _kernel(
    layer_ref,   # (1,) int32 scalar prefetch
    start_ref,   # (B,) int32 scalar prefetch
    end_ref,     # (B,) int32 scalar prefetch
    q_ref,       # (1, Hq, D)
    k_self_ref,  # (1, Hkv, D)
    v_self_ref,  # (1, Hkv, D)
    k_ref,       # (1, 1, Hkv, BS, D)
    v_ref,       # (1, 1, Hkv, BS, D)
    o_ref,       # (1, Hq, D)
    m_scr,       # (Hq, 128) f32 (col 0 live)
    l_scr,       # (Hq, 128) f32 (col 0 live)
    acc_scr,     # (Hq, D) f32
    *,
    scale: float,
    block_s: int,
    hkv: int,
    groups: int,
    s_max: int,
):
    b = pl.program_id(0)
    si = pl.program_id(1)
    ns = pl.num_programs(1)
    hq = hkv * groups

    @pl.when(si == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, INIT_M)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32)  # (Hq, D)

    # live: this block contains at least one slot in [start, end)
    block_live = (si * block_s < end_ref[b]) & (
        (si + 1) * block_s > start_ref[b]
    )

    @pl.when(block_live)
    def _process():
        k = k_ref[0, 0].astype(jnp.float32)  # (Hkv, BS, D)
        s = _scores(q, k, hkv, groups, block_s) * scale  # (Hq, BS)

        slot = si * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (hq, block_s), 1
        )
        bad = (
            (slot < start_ref[b])
            | (slot >= end_ref[b])
            | (slot >= s_max)
        )
        s = jnp.where(bad, MASK_VALUE, s)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # (Hq, BS)
        l_scr[:, :1] = l_scr[:, :1] * corr + jnp.sum(p, 1, keepdims=True)

        # zero OOB V rows (the last block may overhang s_max; 0 * garbage
        # would poison the matmul)
        vrow_ok = (
            si * block_s
            + jax.lax.broadcasted_iota(jnp.int32, (1, block_s, 1), 1)
        ) < s_max
        v = jnp.where(vrow_ok, v_ref[0, 0].astype(jnp.float32), 0.0)
        acc_scr[:] = acc_scr[:] * corr + _weighted_v(
            p, v, hkv, groups, block_s
        )
        m_scr[:, :1] = m_new

    @pl.when(si == ns - 1)
    def _finish():
        # fold in the self token, then normalize
        ks = k_self_ref[0].astype(jnp.float32)  # (Hkv, D)
        vs = v_self_ref[0].astype(jnp.float32)
        s_self = _scores(q, ks[:, None, :], hkv, groups, 1) * scale
        m_prev = m_scr[:, :1]
        m_fin = jnp.maximum(m_prev, s_self)
        corr = jnp.exp(m_prev - m_fin)
        p_self = jnp.exp(s_self - m_fin)  # (Hq, 1)
        l_fin = l_scr[:, :1] * corr + p_self
        acc_fin = acc_scr[:] * corr + _weighted_v(
            p_self, vs[:, None, :], hkv, groups, 1
        )
        o_ref[0] = (acc_fin / jnp.maximum(l_fin, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_s", "interpret")
)
def decode_attention_slab(
    q,        # (B, Hq, D)
    k_slabs,  # (L, B, Hkv, S, D) — the FULL stacked cache
    v_slabs,  # (L, B, Hkv, S, D)
    k_self,   # (B, Hkv, D)
    v_self,   # (B, Hkv, D)
    layer,    # scalar int32: which layer's slab to read
    start,    # (B,) int32 or None
    end,      # (B,) int32 — exclusive upper bound of live slots
    *,
    scale: float | None = None,
    block_s: int = 512,
    interpret: bool = False,
):
    b, hq, d = q.shape
    _, _, hkv, s_max, _ = k_slabs.shape
    groups = hq // hkv
    if scale is None:
        scale = d ** -0.5
    if start is None:
        start = jnp.zeros((b,), jnp.int32)
    start = start.astype(jnp.int32)
    end = end.astype(jnp.int32)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    block_s = min(block_s, s_max)
    ns = pl.cdiv(s_max, block_s)

    def kv_index(bb, si, layer_ref, start_ref, end_ref):
        # clamp OUTSIDE the live range on both sides: Pallas
        # re-addresses the same block (no fresh DMA) and the kernel
        # body skips the compute. Without the lower clamp a
        # right-aligned batch (large kv_start) still DMA'd every dead
        # leading block each step — cost scaled with end, not
        # end - start.
        first_live = start_ref[bb] // block_s
        last_live = jnp.maximum(
            (end_ref[bb] + block_s - 1) // block_s - 1, 0
        )
        si = jnp.clip(si, first_live, jnp.maximum(last_live, first_live))
        return (layer_ref[0], bb, 0, si, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, ns),
        in_specs=[
            pl.BlockSpec((1, hq, d), lambda bb, si, *_: (bb, 0, 0)),
            pl.BlockSpec((1, hkv, d), lambda bb, si, *_: (bb, 0, 0)),
            pl.BlockSpec((1, hkv, d), lambda bb, si, *_: (bb, 0, 0)),
            pl.BlockSpec((1, 1, hkv, block_s, d), kv_index),
            pl.BlockSpec((1, 1, hkv, block_s, d), kv_index),
        ],
        out_specs=pl.BlockSpec((1, hq, d), lambda bb, si, *_: (bb, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.VMEM((hq, d), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _kernel,
        scale=scale,
        block_s=block_s,
        hkv=hkv,
        groups=groups,
        s_max=s_max,
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        interpret=interpret,
    )(layer, start, end, q, k_self, v_self, k_slabs, v_slabs)


def decode_attention(q, k_slab, v_slab, k_self, v_self, start, end,
                     *, scale=None, block_s=512, interpret=False):
    """Single-layer convenience wrapper (adds the layer axis)."""
    return decode_attention_slab(
        q, k_slab[None], v_slab[None], k_self, v_self,
        jnp.int32(0), start, end,
        scale=scale, block_s=block_s, interpret=interpret,
    )


# --------------------------------------------------------------------- #
# Manual-DMA variant: double-buffered HBM->VMEM copies with a DYNAMIC
# trip count, so only live blocks are ever transferred (the grid-based
# version above still pays DMA for dead grid steps).
# --------------------------------------------------------------------- #


def _dma_kernel(
    layer_ref,   # (1,) int32
    start_ref,   # (B,) int32
    end_ref,     # (B,) int32
    q_ref,       # (1, Hq, D) VMEM
    k_self_ref,  # (1, Hkv, D) VMEM
    v_self_ref,  # (1, Hkv, D) VMEM
    *rest,       # HBM slabs + outputs + scratch; layout depends on
    #              `quantized` (int8-KV adds two f32 scale slabs, their
    #              double-buffers, and two more semaphore columns):
    #     k_hbm, v_hbm[, ks_hbm, vs_hbm], o_ref,
    #     k_buf, v_buf[, ks_buf, vs_buf], sems
    scale: float,
    block_s: int,
    hkv: int,
    groups: int,
    s_max: int,
    quantized: bool,
):
    if quantized:
        (k_hbm, v_hbm, ks_hbm, vs_hbm, o_ref,
         k_buf, v_buf, ks_buf, vs_buf, sems) = rest
    else:
        k_hbm, v_hbm, o_ref, k_buf, v_buf, sems = rest
    b = pl.program_id(0)
    hq = hkv * groups
    layer = layer_ref[0]
    start = start_ref[b]
    end = end_ref[b]
    q = q_ref[0].astype(jnp.float32)

    def _write_out(m_prev, l_prev, acc):
        ks = k_self_ref[0].astype(jnp.float32)
        vs = v_self_ref[0].astype(jnp.float32)
        s_self = _scores(q, ks[:, None, :], hkv, groups, 1) * scale
        m_fin = jnp.maximum(m_prev, s_self)
        corr = jnp.exp(m_prev - m_fin)
        p_self = jnp.exp(s_self - m_fin)
        l_fin = l_prev * corr + p_self
        acc_fin = acc * corr + _weighted_v(
            p_self, vs[:, None, :], hkv, groups, 1
        )
        o_ref[0] = (acc_fin / jnp.maximum(l_fin, 1e-30)).astype(o_ref.dtype)

    first_blk = start // block_s
    n_blocks = jnp.maximum(pl.cdiv(end, block_s) - first_blk, 0)

    # int8-KV scale slabs are (L, B, Hkv, S): the slot slice is a LANE
    # slice, so the clamp must be provably 128-aligned; bf16/int8 KV
    # slabs slice slots on a sublane dim, where 8 suffices.
    unit = 128 if quantized else 8

    def blk_start(i):
        # clamped for the DMA so the copy stays in bounds (masking below
        # uses the clamped global indices). Computed in units of `unit`
        # and multiplied back so Mosaic can PROVE the dynamic slice
        # offset is tile-aligned — a raw minimum() of two multiples
        # defeats its divisibility prover (1.7B batch-8 compile failure,
        # round 4); block_s and s_max are unit-aligned, asserted at
        # dispatch.
        return jnp.minimum(
            (first_blk + i) * (block_s // unit), (s_max - block_s) // unit
        ) * unit

    def dma(slot, i, buf, hbm, sem_col):
        return pltpu.make_async_copy(
            hbm.at[layer, b, :, pl.ds(blk_start(i), block_s)],
            buf.at[slot],
            sems.at[slot, sem_col],
        )

    def start_block_dmas(slot, i):
        dma(slot, i, k_buf, k_hbm, 0).start()
        dma(slot, i, v_buf, v_hbm, 1).start()
        if quantized:
            dma(slot, i, ks_buf, ks_hbm, 2).start()
            dma(slot, i, vs_buf, vs_hbm, 3).start()

    def wait_block_dmas(slot, i):
        dma(slot, i, k_buf, k_hbm, 0).wait()
        dma(slot, i, v_buf, v_hbm, 1).wait()
        if quantized:
            dma(slot, i, ks_buf, ks_hbm, 2).wait()
            dma(slot, i, vs_buf, vs_hbm, 3).wait()

    @pl.when(n_blocks > 0)
    def _run():
        start_block_dmas(0, 0)

        def body(i, carry):
            m_prev, l_prev, acc = carry
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_blocks)
            def _prefetch():
                start_block_dmas(jax.lax.rem(i + 1, 2), i + 1)

            wait_block_dmas(slot, i)

            kh_all = k_buf[slot].astype(jnp.float32)  # (Hkv, BS, D)
            vh_all = v_buf[slot].astype(jnp.float32)
            s = _scores(q, kh_all, hkv, groups, block_s) * scale
            if quantized:
                # fold per-slot K scales into the LOGITS instead of
                # dequantizing the (Hkv, BS, D) buffer: q . (k_int8*ks)
                # == (q . k_int8) * ks, and the multiply shrinks from
                # O(BS*D) VPU elements to O(G*BS). Must happen BEFORE
                # masking — a dead slot's scale can be 0 and would
                # un-mask MASK_VALUE positions if applied after.
                s = (
                    s.reshape(hkv, groups, block_s)
                    * ks_buf[slot][:, None, :]
                ).reshape(hq, block_s)

            gslot = blk_start(i) + jax.lax.broadcasted_iota(
                jnp.int32, (hq, block_s), 1
            )
            nominal_lo = (first_blk + i) * block_s
            bad = (
                (gslot < jnp.maximum(start, nominal_lo))
                | (gslot >= end)
            )
            s = jnp.where(bad, MASK_VALUE, s)

            m_new = jnp.maximum(m_prev, jnp.max(s, 1, keepdims=True))
            corr = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = l_prev * corr + jnp.sum(p, 1, keepdims=True)
            if quantized:
                # V scales fold into the probabilities the same way:
                # sum_k p_k * (v_int8_k * vs_k) == sum_k (p_k*vs_k) *
                # v_int8_k. The softmax denominator uses the UNSCALED p.
                pv = (
                    p.reshape(hkv, groups, block_s)
                    * vs_buf[slot][:, None, :]
                ).reshape(hq, block_s)
            else:
                pv = p
            acc = acc * corr + _weighted_v(pv, vh_all, hkv, groups,
                                           block_s)
            return m_new, l_new, acc

        m0 = jnp.full((hq, 1), INIT_M, jnp.float32)
        l0 = jnp.zeros((hq, 1), jnp.float32)
        a0 = jnp.zeros((hq, q.shape[-1]), jnp.float32)
        m_fin, l_fin, acc = jax.lax.fori_loop(
            0, n_blocks, body, (m0, l0, a0)
        )
        _write_out(m_fin, l_fin, acc)

    @pl.when(n_blocks == 0)
    def _self_only():
        hq_ = hkv * groups
        _write_out(
            jnp.full((hq_, 1), INIT_M, jnp.float32),
            jnp.zeros((hq_, 1), jnp.float32),
            jnp.zeros((hq_, q.shape[-1]), jnp.float32),
        )


@functools.partial(
    jax.jit, static_argnames=("scale", "block_s", "interpret")
)
def decode_attention_dma(
    q,        # (B, Hq, D)
    k_slabs,  # (L, B, Hkv, S, D) — int8 when k_scales is given
    v_slabs,  # (L, B, Hkv, S, D)
    k_self,   # (B, Hkv, D) — always UNQUANTIZED (bf16/f32)
    v_self,   # (B, Hkv, D)
    layer,    # scalar int32
    start,    # (B,) int32 or None
    end,      # (B,) int32
    *,
    k_scales=None,  # (L, B, Hkv, S) f32 — int8-KV per-slot scales
    v_scales=None,
    scale: float | None = None,
    block_s: int = 512,
    interpret: bool = False,
):
    b, hq, d = q.shape
    _, _, hkv, s_max, _ = k_slabs.shape
    groups = hq // hkv
    quantized = k_scales is not None
    if scale is None:
        scale = d ** -0.5
    if start is None:
        start = jnp.zeros((b,), jnp.int32)
    start = start.astype(jnp.int32)
    end = end.astype(jnp.int32)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    block_s = min(block_s, s_max)
    unit = 128 if quantized else 8
    if s_max % unit or block_s % unit:
        # the clamped DMA start is computed in units of `unit` so Mosaic
        # can prove slice alignment — engine/serving allocate 8-aligned
        # slabs (128-aligned for int8-KV, whose scale slabs are sliced
        # on a LANE dim); anything else would silently drop tail slots
        raise ValueError(
            f"decode_attention_dma needs {unit}-aligned slab/block "
            f"sizes, got s_max={s_max} block_s={block_s}"
        )

    slab_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    scratch = [
        pltpu.VMEM((2, hkv, block_s, d), k_slabs.dtype),
        pltpu.VMEM((2, hkv, block_s, d), v_slabs.dtype),
    ]
    operands = [layer, start, end, q, k_self, v_self, k_slabs, v_slabs]
    if quantized:
        slab_specs += [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        scratch += [
            pltpu.VMEM((2, hkv, block_s), jnp.float32),
            pltpu.VMEM((2, hkv, block_s), jnp.float32),
        ]
        operands += [
            k_scales.astype(jnp.float32), v_scales.astype(jnp.float32)
        ]
    scratch.append(pltpu.SemaphoreType.DMA((2, 4 if quantized else 2)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hq, d), lambda bb, *_: (bb, 0, 0)),
            pl.BlockSpec((1, hkv, d), lambda bb, *_: (bb, 0, 0)),
            pl.BlockSpec((1, hkv, d), lambda bb, *_: (bb, 0, 0)),
            *slab_specs,
        ],
        out_specs=pl.BlockSpec((1, hq, d), lambda bb, *_: (bb, 0, 0)),
        scratch_shapes=scratch,
    )

    kernel = functools.partial(
        _dma_kernel,
        scale=scale,
        block_s=block_s,
        hkv=hkv,
        groups=groups,
        s_max=s_max,
        quantized=quantized,
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        interpret=interpret,
    )(*operands)
