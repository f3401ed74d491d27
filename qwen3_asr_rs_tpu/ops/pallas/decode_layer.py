"""Fused decoder DECODE STEP as one Pallas kernel (the decode megakernel).

One greedy-decode step on the scan path costs ~200 small XLA ops across 28
layers; the fused kernel computes ALL decoder layers in a single
pallas_call:

  * grid = (num_layers,): Pallas's automatic input pipelining
    double-buffers the next layer's weight blocks (~30 MB/layer) behind
    the current layer's compute — a hardware prefetch the op-by-op path
    cannot express. Measured on v5e at 0.6B: bf16 1.96 ms/token vs 2.21
    scan; int8 weight-only 1.36 ms/token (the in-kernel dequant overlaps
    the next layer's DMA, so decode is bound by int8 HBM bytes);
  * the whole batch is processed per layer (weights stream ONCE per step
    regardless of batch size); hidden state lives in VMEM scratch;
  * attention runs over the layer's KV slab block with per-example
    [start, end) live-slot masks and the fresh K/V folded in as an
    explicit self-term;
  * per-layer fresh K/V are kernel outputs, written back to the slab by
    the caller with one dynamic_update_slice.

Dispatch falls back to the scan path for attention biases or non-shared
write slots. Numerics match text_decoder._decode_layer_masked: every
stage rounds through the engine compute dtype exactly like the scan path
(f32 norms/softmax, engine-dtype matmuls with f32 accumulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -1e9

# The kernel's VMEM ceiling: ~30 MB of weights per layer double-buffered
# by the pipeline, plus the per-layer slab blocks. Dispatch
# (TextDecoder._fused_step_vmem_ok) checks a block-footprint estimate
# against this before choosing the kernel.
VMEM_LIMIT_BYTES = 120 * 1024 * 1024


def _rms_norm(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)) * w.astype(jnp.float32)


def _mm(x, w, scale, cdt):
    """(R, K) @ (K, N) in the compute dtype with f32 accumulation.

    ``w`` may be int8 (weight-only quantization): int8 values are exact
    in bf16, and the per-output-channel ``scale`` is applied after the
    contraction. For unquantized weights the caller passes scale == 1,
    which XLA folds away. Dequantizing HERE is what makes int8 pay off:
    the VPU convert overlaps the next layer's weight DMA in the Pallas
    pipeline, so decode becomes bound by int8 (half) HBM bytes.
    """
    y = jax.lax.dot_general(
        x.astype(cdt), w.astype(cdt),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y * scale


def _kernel(
    # scalar prefetch
    start_ref,    # (B,) int32: live slots [start_b, end_b)
    end_ref,      # (B,) int32
    # inputs (per grid step l)
    x_ref,        # (B, H) — initial hidden (read at l == 0)
    cos_ref,      # (B, D) per-example rotary
    sin_ref,      # (B, D)
    norms_ref,    # (1, 8, H) — rows: in_ln, post_ln, q_norm, k_norm
    q_w_ref,      # (1, H, NqD)
    k_w_ref,      # (1, H, NkvD)
    v_w_ref,      # (1, H, NkvD)
    o_w_ref,      # (1, NqD, H)
    gate_w_ref,   # (1, H, I)
    up_w_ref,     # (1, H, I)
    down_w_ref,   # (1, I, H)
    scales_ref,   # (1, 8, max_N) f32 — rows: q,k,v,o,gate,up,down scales
    k_slab_ref,   # (1, B, S, Hkv, D)
    v_slab_ref,   # (1, B, S, Hkv, D)
    # outputs
    h_out_ref,    # (B, H) — final hidden (written at l == L-1)
    k_out_ref,    # (1, B, Hkv, D) fresh K for this layer
    v_out_ref,    # (1, B, Hkv, D)
    # scratch
    h_scr,        # (B_pad, H) f32 — rows 0..B-1 hold the hidden state
    *,
    eps: float,
    hkv: int,
    groups: int,
    head_dim: int,
    s_max: int,
    batch: int,
):
    l = pl.program_id(0)
    nl = pl.num_programs(0)
    hq = hkv * groups
    d = head_dim
    scale = d ** -0.5
    b = batch

    @pl.when(l == 0)
    def _init():
        h_scr[:b] = x_ref[:].astype(jnp.float32)

    # The scan path rounds activations to the compute dtype between ops;
    # every stage here rounds the same way so tokens match.
    cdt = x_ref.dtype  # bf16 in production, f32 in parity tests
    h = h_scr[:b]  # (B, H) f32 container holding cdt-rounded values

    def sc(row, n):
        return scales_ref[0, row, :n][None, :]

    nq_d = q_w_ref.shape[-1]
    nkv_d = k_w_ref.shape[-1]
    inter = gate_w_ref.shape[-1]
    h_dim = o_w_ref.shape[-1]

    # ---- attention block
    xn = _rms_norm(h, norms_ref[0, 0][None, :], eps).astype(cdt)
    q = _mm(xn, q_w_ref[0], sc(0, nq_d), cdt).astype(cdt)   # (B, NqD)
    k = _mm(xn, k_w_ref[0], sc(1, nkv_d), cdt).astype(cdt)  # (B, NkvD)
    v = _mm(xn, v_w_ref[0], sc(2, nkv_d), cdt).astype(cdt)

    q = q.reshape(b * hq, d)
    k = k.reshape(b * hkv, d)
    v = v.reshape(b * hkv, d)
    # per-head QK rms norm (rows 2/3 of the packed norm tensor, padded)
    q = _rms_norm(q, norms_ref[0, 2, :d][None, :], eps).astype(cdt)
    k = _rms_norm(k, norms_ref[0, 3, :d][None, :], eps).astype(cdt)

    # rotary (rotate-half), per-example cos/sin
    cos = cos_ref[:].astype(jnp.float32)  # (B, D)
    sin = sin_ref[:].astype(jnp.float32)
    half = d // 2

    def rope(t, heads):
        tf = t.astype(jnp.float32).reshape(b, heads, d)
        t1 = tf[..., :half]
        t2 = tf[..., half:]
        rot = jnp.concatenate([-t2, t1], axis=-1)
        out = tf * cos[:, None, :] + rot * sin[:, None, :]
        return out.reshape(b * heads, d).astype(cdt)

    q = rope(q, hq)
    k = rope(k, hkv)

    k_out_ref[0] = k.reshape(b, hkv, d).astype(k_out_ref.dtype)
    v_out_ref[0] = v.reshape(b, hkv, d).astype(v_out_ref.dtype)

    # attention per example over the resident slab block
    attn_rows = []
    for bb in range(b):
        qb = q[bb * hq : (bb + 1) * hq]          # (Hq, D)
        kb = k[bb * hkv : (bb + 1) * hkv]        # (Hkv, D)
        vb = v[bb * hkv : (bb + 1) * hkv]
        rows = []
        for hh in range(hkv):
            qh = qb[hh * groups : (hh + 1) * groups]
            kh = k_slab_ref[0, bb, :, hh, :].astype(cdt)  # (S, D)
            rows.append(
                jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        s = jnp.concatenate(rows, axis=0) * scale  # (Hq, S)
        slot = jax.lax.broadcasted_iota(jnp.int32, (hq, s_max), 1)
        bad = (slot < start_ref[bb]) | (slot >= end_ref[bb])
        s = jnp.where(bad, MASK_VALUE, s)

        s_self = jnp.sum(
            qb.reshape(hkv, groups, d).astype(jnp.float32)
            * kb.reshape(hkv, 1, d).astype(jnp.float32),
            axis=-1,
        ).reshape(hq, 1) * scale

        m = jnp.maximum(jnp.max(s, 1, keepdims=True), s_self)
        p = jnp.exp(s - m)
        p_self = jnp.exp(s_self - m)
        denom = jnp.sum(p, 1, keepdims=True) + p_self
        # normalize FIRST; probabilities round to cdt before the V matmul
        # (exactly what the scan path's einsum does); self-term stays f32
        pn = (p / denom).astype(cdt)
        pn_self = p_self / denom

        pv = []
        for hh in range(hkv):
            ph = pn[hh * groups : (hh + 1) * groups]
            vh = v_slab_ref[0, bb, :, hh, :].astype(cdt)
            pv.append(
                jax.lax.dot_general(
                    ph, vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        ab = jnp.concatenate(pv, axis=0)
        ab = ab + pn_self * jnp.repeat(
            vb.astype(jnp.float32), groups, axis=0
        )
        attn_rows.append(ab.astype(cdt).reshape(1, hq * d))
    attn = jnp.concatenate(attn_rows, axis=0)  # (B, Hq*D)

    o = _mm(attn, o_w_ref[0], sc(3, h_dim), cdt).astype(cdt)
    h = (h.astype(cdt) + o).astype(jnp.float32)

    # ---- MLP block
    xn = _rms_norm(h, norms_ref[0, 1][None, :], eps).astype(cdt)
    gate = _mm(xn, gate_w_ref[0], sc(4, inter), cdt).astype(cdt)
    gate = (
        gate.astype(jnp.float32)
        * jax.nn.sigmoid(gate.astype(jnp.float32))
    ).astype(cdt)  # silu, rounded like the scan path
    up = _mm(xn, up_w_ref[0], sc(5, inter), cdt).astype(cdt)
    down = _mm(gate * up, down_w_ref[0], sc(6, h_dim), cdt).astype(cdt)
    h = (h.astype(cdt) + down).astype(jnp.float32)

    h_scr[:b] = h

    @pl.when(l == nl - 1)
    def _finish():
        h_out_ref[:] = h.astype(h_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def decode_layers_fused(
    x,        # (B, H) current hidden (embedded tokens)
    cos,      # (B, D)
    sin,      # (B, D)
    layers,   # dict of stacked layer params (L, ...)
    k_slabs,  # (L, B, S, Hkv, D)
    v_slabs,  # (L, B, S, Hkv, D)
    start,    # (B,) int32 or None — live-slot lower bound per example
    end,      # (B,) or scalar int32 — live-slot upper bound (exclusive)
    *,
    eps: float,
    interpret: bool = False,
):
    """Run all decoder layers for one token per example.

    Returns (hidden (B, H), ks (L, B, Hkv, D), vs (L, B, Hkv, D)).
    ``layers`` may hold bf16/f32 weights (``q_w`` ...) or int8 weight-only
    quantized pairs (``q_w_q`` + ``q_w_s`` from weights/quantize.py).
    """
    nl, b, s_max, hkv, d = k_slabs.shape
    h_dim = x.shape[-1]
    quantized = "q_w_q" in layers

    names = ("q_w", "k_w", "v_w", "o_w", "gate_w", "up_w", "down_w")
    if quantized:
        weights = {n: layers[f"{n}_q"] for n in names}
    else:
        weights = {n: layers[n] for n in names}

    nq_d = weights["q_w"].shape[-1]
    nkv_d = weights["k_w"].shape[-1]
    inter = weights["gate_w"].shape[-1]
    groups = nq_d // nkv_d

    # pack the 7 per-output-channel scale vectors into one tile-aligned
    # (L, 8, max_N) tensor (a (1, N) block fails TPU tiling rules)
    max_n = max(nq_d, nkv_d, inter, h_dim)
    scales_packed = jnp.ones((nl, 8, max_n), jnp.float32)
    if quantized:
        for row, n in enumerate(names):
            sv = layers[f"{n}_s"].astype(jnp.float32)
            scales_packed = scales_packed.at[:, row, : sv.shape[-1]].set(sv)

    # pack the norm vectors the same way: rows in_ln, post_ln, q_norm, k_norm
    norms_packed = jnp.zeros((nl, 8, h_dim), layers["input_ln_w"].dtype)
    norms_packed = norms_packed.at[:, 0].set(layers["input_ln_w"])
    norms_packed = norms_packed.at[:, 1].set(layers["post_ln_w"])
    norms_packed = norms_packed.at[:, 2, :d].set(layers["q_norm_w"])
    norms_packed = norms_packed.at[:, 3, :d].set(layers["k_norm_w"])

    if start is None:
        start = jnp.zeros((b,), jnp.int32)
    start = jnp.broadcast_to(start, (b,)).astype(jnp.int32)
    end = jnp.broadcast_to(end, (b,)).astype(jnp.int32)

    def const_idx(l, *_):
        return (0, 0)

    def lay3(l, *_):
        return (l, 0, 0)

    def lay_slab(l, *_):
        return (l, 0, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nl,),
        in_specs=[
            pl.BlockSpec((b, h_dim), const_idx),       # x
            pl.BlockSpec((b, d), const_idx),           # cos
            pl.BlockSpec((b, d), const_idx),           # sin
            pl.BlockSpec((1, 8, h_dim), lay3),         # packed norms
            pl.BlockSpec((1, h_dim, nq_d), lay3),      # q_w
            pl.BlockSpec((1, h_dim, nkv_d), lay3),     # k_w
            pl.BlockSpec((1, h_dim, nkv_d), lay3),     # v_w
            pl.BlockSpec((1, nq_d, h_dim), lay3),      # o_w
            pl.BlockSpec((1, h_dim, inter), lay3),     # gate_w
            pl.BlockSpec((1, h_dim, inter), lay3),     # up_w
            pl.BlockSpec((1, inter, h_dim), lay3),     # down_w
            pl.BlockSpec((1, 8, max_n), lay3),         # packed scales
            pl.BlockSpec((1, b, s_max, hkv, d), lay_slab),  # k slab
            pl.BlockSpec((1, b, s_max, hkv, d), lay_slab),  # v slab
        ],
        out_specs=(
            pl.BlockSpec((b, h_dim), const_idx),
            pl.BlockSpec((1, b, hkv, d), lambda l, *_: (l, 0, 0, 0)),
            pl.BlockSpec((1, b, hkv, d), lambda l, *_: (l, 0, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((max(8, b), h_dim), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _kernel,
        eps=eps,
        hkv=hkv,
        groups=groups,
        head_dim=d,
        s_max=s_max,
        batch=b,
    )

    h_out, ks, vs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h_dim), x.dtype),
            jax.ShapeDtypeStruct((nl, b, hkv, d), k_slabs.dtype),
            jax.ShapeDtypeStruct((nl, b, hkv, d), v_slabs.dtype),
        ),
        interpret=interpret,
    )(
        start, end, x, cos, sin,
        norms_packed,
        weights["q_w"], weights["k_w"], weights["v_w"],
        weights["o_w"],
        weights["gate_w"], weights["up_w"], weights["down_w"],
        scales_packed,
        k_slabs, v_slabs,
    )
    return h_out, ks, vs
