"""Fused decoder DECODE STEP as one Pallas kernel (the decode megakernel).

One greedy-decode step on the scan path costs ~200 small XLA ops across 28
layers; each op on (1, ...) shapes pays pipeline latency, and the whole
step runs at ~78% of the weight-streaming bound. This kernel computes ALL
decoder layers in a single pallas_call:

  * grid = (num_layers,): Pallas's automatic input pipelining
    double-buffers the next layer's weight blocks (~30 MB/layer) behind
    the current layer's compute — the hardware prefetch the scan path
    can't express;
  * the hidden state lives in VMEM scratch across grid steps;
  * attention runs over the layer's KV slab block (live-slot masked) with
    the fresh K/V folded in as an explicit self-term;
  * per-layer fresh K/V are kernel outputs, written back to the slab by
    the caller with one dynamic_update_slice.

Scope (dispatch falls back to the scan path otherwise): batch == 1,
no attention biases, bf16/f32 weights (not int8), single shared position.
Numerics match text_decoder._decode_layer_masked (f32 norms/softmax,
bf16 matmuls with f32 accumulation) — verified by token-parity tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -1e9


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
    end_ref,      # (1,) int32: live slots [0, end)
    # inputs (per grid step l)
    x_ref,        # (1, H) — initial hidden (read at l == 0)
    cos_ref,      # (1, D)
    sin_ref,      # (1, D)
    norms_ref,    # (1, 8, H) — rows: in_ln, post_ln, q_norm, k_norm
    q_w_ref,      # (1, H, NqD)
    k_w_ref,      # (1, H, NkvD)
    v_w_ref,      # (1, H, NkvD)
    o_w_ref,      # (1, NqD, H)
    gate_w_ref,   # (1, H, I)
    up_w_ref,     # (1, H, I)
    down_w_ref,   # (1, I, H)
    scales_ref,   # (1, 8, max_N) f32 — rows: q,k,v,o,gate,up,down scales
                  # (padded; ones when unquantized)
    k_slab_ref,   # (1, 1, S, Hkv, D)
    v_slab_ref,   # (1, 1, S, Hkv, D)
    # outputs
    h_out_ref,    # (1, H) — final hidden (written at l == L-1)
    k_out_ref,    # (1, Hkv, D) fresh K for this layer
    v_out_ref,    # (1, Hkv, D)
    # scratch
    h_scr,        # (8, H) f32 — row 0 is the hidden state
    *,
    eps: float,
    hkv: int,
    groups: int,
    head_dim: int,
    s_max: int,
):
    l = pl.program_id(0)
    nl = pl.num_programs(0)
    hq = hkv * groups
    d = head_dim
    scale = d ** -0.5

    @pl.when(l == 0)
    def _init():
        h_scr[:1] = x_ref[:].astype(jnp.float32)

    # The scan path rounds activations to the compute dtype between ops;
    # every stage here rounds the same way so tokens match bit-for-bit.
    cdt = x_ref.dtype  # bf16 in production, f32 in parity tests
    h = h_scr[:1]  # (1, H) f32 container holding cdt-rounded values

    # ---- attention block
    def sc(row, n):
        return scales_ref[0, row, :n][None, :]

    xn = _rms_norm(h, norms_ref[0, 0][None, :], eps).astype(cdt)
    nq_d = q_w_ref.shape[-1]
    nkv_d = k_w_ref.shape[-1]
    inter = gate_w_ref.shape[-1]
    h_dim = o_w_ref.shape[-1]
    q = _mm(xn, q_w_ref[0], sc(0, nq_d), cdt).astype(cdt).reshape(hq, d)
    k = _mm(xn, k_w_ref[0], sc(1, nkv_d), cdt).astype(cdt).reshape(hkv, d)
    v = _mm(xn, v_w_ref[0], sc(2, nkv_d), cdt).astype(cdt).reshape(hkv, d)

    # per-head QK rms norm (rows 2/3 of the packed norm tensor, padded)
    q = _rms_norm(q, norms_ref[0, 2, :d][None, :], eps).astype(cdt)
    k = _rms_norm(k, norms_ref[0, 3, :d][None, :], eps).astype(cdt)

    # rotary (rotate-half)
    cos = cos_ref[0].astype(jnp.float32)[None, :]  # (1, D)
    sin = sin_ref[0].astype(jnp.float32)[None, :]
    half = d // 2

    def rope(t):
        tf = t.astype(jnp.float32)
        t1 = tf[:, :half]
        t2 = tf[:, half:]
        rot = jnp.concatenate([-t2, t1], axis=-1)
        return (tf * cos + rot * sin).astype(cdt)

    q = rope(q)
    k = rope(k)

    k_out_ref[0] = k.astype(k_out_ref.dtype)
    v_out_ref[0] = v.astype(v_out_ref.dtype)

    # scores over the slab + self term, online softmax not needed since
    # the whole slab block is resident
    rows = []
    for hh in range(hkv):
        qh = q[hh * groups : (hh + 1) * groups]                # (G, D)
        kh = k_slab_ref[0, 0, :, hh, :].astype(cdt)            # (S, D)
        rows.append(
            jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    s = jnp.concatenate(rows, axis=0) * scale  # (Hq, S)
    slot = jax.lax.broadcasted_iota(jnp.int32, (hq, s_max), 1)
    s = jnp.where(slot >= end_ref[0], MASK_VALUE, s)

    s_self = jnp.sum(
        q.reshape(hkv, groups, d).astype(jnp.float32)
        * k.reshape(hkv, 1, d).astype(jnp.float32),
        axis=-1,
    ).reshape(hq, 1) * scale

    m = jnp.maximum(jnp.max(s, 1, keepdims=True), s_self)
    p = jnp.exp(s - m)
    p_self = jnp.exp(s_self - m)
    denom = jnp.sum(p, 1, keepdims=True) + p_self
    # normalize FIRST and round probabilities to bf16 before the V matmul
    # (exactly what the scan path's einsum does), self-term stays f32
    pn = (p / denom).astype(cdt)
    pn_self = p_self / denom

    pv = []
    for hh in range(hkv):
        ph = pn[hh * groups : (hh + 1) * groups]
        vh = v_slab_ref[0, 0, :, hh, :].astype(cdt)
        pv.append(
            jax.lax.dot_general(
                ph, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    attn = jnp.concatenate(pv, axis=0)
    attn = attn + pn_self * jnp.repeat(
        v.astype(jnp.float32), groups, axis=0
    )
    attn = attn.astype(cdt)  # (Hq, D)

    o = _mm(attn.reshape(1, hq * d), o_w_ref[0], sc(3, h_dim), cdt).astype(cdt)
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

    h_scr[:1] = h

    @pl.when(l == nl - 1)
    def _finish():
        h_out_ref[:] = h.astype(h_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def decode_layers_fused(
    x,        # (1, H) current hidden (embedded token)
    cos,      # (1, D)
    sin,      # (1, D)
    layers,   # dict of stacked layer params (L, ...)
    k_slabs,  # (L, 1, S, Hkv, D)
    v_slabs,  # (L, 1, S, Hkv, D)
    end,      # scalar int32: live slots [0, end)
    *,
    eps: float,
    interpret: bool = False,
):
    """Run all decoder layers for one token. Returns (hidden, ks, vs).

    ``layers`` may hold bf16/f32 weights (``q_w`` ...) or int8 weight-only
    quantized pairs (``q_w_q`` + ``q_w_s`` from weights/quantize.py); the
    quantized form streams half the HBM bytes and dequantizes in VMEM.
    """
    nl, _, s_max, hkv, d = k_slabs.shape
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
    groups = nq_d // nkv_d
    hq = hkv * groups

    end = jnp.asarray(end, jnp.int32).reshape(1)

    def const_idx(l, *_):
        return (0, 0)

    def lay2(l, *_):
        return (l, 0)

    def lay3(l, *_):
        return (l, 0, 0)

    def lay_slab(l, *_):
        return (l, 0, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nl,),
        in_specs=[
            pl.BlockSpec((1, h_dim), const_idx),       # x
            pl.BlockSpec((1, d), const_idx),           # cos
            pl.BlockSpec((1, d), const_idx),           # sin
            pl.BlockSpec((1, 8, h_dim), lay3),         # packed norms
            pl.BlockSpec((1, h_dim, nq_d), lay3),      # q_w
            pl.BlockSpec((1, h_dim, nkv_d), lay3),     # k_w
            pl.BlockSpec((1, h_dim, nkv_d), lay3),     # v_w
            pl.BlockSpec((1, nq_d, h_dim), lay3),      # o_w
            pl.BlockSpec((1, h_dim, inter), lay3),     # gate_w
            pl.BlockSpec((1, h_dim, inter), lay3),     # up_w
            pl.BlockSpec((1, inter, h_dim), lay3),     # down_w
            pl.BlockSpec((1, 8, max_n), lay3),         # packed scales
            pl.BlockSpec((1, 1, s_max, hkv, d), lay_slab),  # k slab
            pl.BlockSpec((1, 1, s_max, hkv, d), lay_slab),  # v slab
        ],
        out_specs=(
            pl.BlockSpec((1, h_dim), const_idx),
            pl.BlockSpec((1, hkv, d), lambda l, *_: (l, 0, 0)),
            pl.BlockSpec((1, hkv, d), lambda l, *_: (l, 0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((8, h_dim), jnp.float32)],
    )

    kernel = functools.partial(
        _kernel,
        eps=eps,
        hkv=hkv,
        groups=groups,
        head_dim=d,
        s_max=s_max,
    )

    h_out, ks, vs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            # ~30 MB of weights per layer, double-buffered by the pipeline
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, h_dim), x.dtype),
            jax.ShapeDtypeStruct((nl, hkv, d), k_slabs.dtype),
            jax.ShapeDtypeStruct((nl, hkv, d), v_slabs.dtype),
        ),
        interpret=interpret,
    )(
        end, x, cos, sin,
        norms_packed,
        weights["q_w"], weights["k_w"], weights["v_w"],
        weights["o_w"],
        weights["gate_w"], weights["up_w"], weights["down_w"],
        scales_packed,
        k_slabs, v_slabs,
    )
    return h_out, ks, vs
