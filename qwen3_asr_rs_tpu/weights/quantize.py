"""Weight-only int8 quantization of the decoder parameter pytree.

Per-output-channel symmetric int8 for every decoder linear (q/k/v/o,
gate/up/down) and the LM head. Embeddings stay bf16 (they are gathered,
not streamed), norms stay full precision. The quantized pytree keeps the
same layer-stacked structure so `lax.scan` over layers is unchanged:
``{name}_w`` is replaced by ``{name}_w_q`` (int8) + ``{name}_w_s`` (f32).

Decode reads every decoder weight once per token, so int8 halves the
dominant HBM traffic; matmuls run through the Pallas kernel in
ops/pallas/quant_matmul.py which dequantizes in VMEM.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..ops.pallas.quant_matmul import (
    quantize_weight,
    quantize_weight_int4,
    quantize_weight_int4_grouped,
    quantize_weight_int4_tiled,
)

PyTree = Any

QUANT_LAYER_WEIGHTS = ("q_w", "k_w", "v_w", "o_w", "gate_w", "up_w", "down_w")

# Merged layout: q|k|v and gate|up are column-concatenated before
# quantization, so decode runs ONE wider MXU dot per group instead of
# three/two narrow ones (fewer MXU pipeline drains at batch 1 — decode
# matvecs are latency bound, not FLOP bound). Per-output-column scales
# make merged quantization equivalent to separate quantization:
# x @ [A|B] == [x@A | x@B] per column and each column's absmax/scale
# only sees its own matrix (XLA may reassociate the wider contraction
# differently, so differences are ~1 ulp, not zero).
MERGED_GROUPS = {
    "qkv_w": ("q_w", "k_w", "v_w"),
    "gateup_w": ("gate_w", "up_w"),
}


# output (column)-parallel linears under Megatron TP: their int4
# packing must be block-local per tp shard (see quantize_weight_int4)
COL_PARALLEL = ("q_w", "k_w", "v_w", "gate_w", "up_w")


def quantize_decoder_params(
    params: PyTree,
    bits: int = 8,
    merge: bool = True,
    lm_bits: int | None = None,
    tp_blocks: int = 1,
    group_size: int | None = None,
) -> PyTree:
    """Return a new decoder param pytree with int8 (or int4) linears.

    bits=4 packs each decoder linear two-values-per-int8 (``{name}_q4``,
    see ops/pallas/quant_matmul.quantize_weight_int4) — a QUARTER of the
    bf16 HBM bytes on the decode-dominant weight streams. The lm_head
    width follows ``lm_bits`` (default: same as ``bits``): int8 runs an
    XLA matvec; int4 runs the tiled Pallas matvec
    (quant_matvec_int4), valid under either layer width.

    ``merge=True`` (default) emits column-merged ``qkv_w`` / ``gateup_w``
    tensors instead of separate q/k/v and gate/up (see MERGED_GROUPS;
    same math, fewer decode dots). Pass ``merge=False``
    under a TP mesh — the Megatron param specs shard the per-projection
    names. Merging is skipped automatically when projection biases exist.

    ``tp_blocks > 1`` (int4 only, requires merge=False) packs the
    column-parallel linears block-locally per tp shard so the dequant
    shards over tp (int4_decoder_param_specs); the lm_head is forced
    int8 (its Pallas matvec is single-device).
    """
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    if tp_blocks > 1 and (bits != 4 or merge):
        raise ValueError("tp_blocks > 1 requires bits=4 and merge=False")
    if group_size is not None:
        # group-wise scales (quality hedge for int4: per-channel's single
        # scale over the whole K dim collapses under weight outliers)
        if bits != 4:
            raise ValueError("group_size applies to bits=4 only")
        if tp_blocks > 1:
            raise ValueError(
                "group-wise int4 is not supported under tensor "
                "parallelism (blocked tp packing is per-channel)"
            )
    layers = dict(params["layers"])
    merge = merge and not any(
        f"{n[:-2]}_b" in layers for n in QUANT_LAYER_WEIGHTS
    )

    plan: dict[str, Any] = {}
    if merge:
        for merged_name, parts in MERGED_GROUPS.items():
            plan[merged_name] = jnp.concatenate(
                [layers.pop(p) for p in parts], axis=-1
            )
        plan["o_w"] = layers.pop("o_w")
        plan["down_w"] = layers.pop("down_w")
    else:
        for name in QUANT_LAYER_WEIGHTS:
            plan[name] = layers.pop(name)

    for name, w in plan.items():  # w: (L, in, out)
        if bits == 4 and group_size is not None:
            w_q, s = jax.vmap(
                lambda t: quantize_weight_int4_grouped(t, group_size)
            )(w)  # scales (L, K // group_size, N)
            layers[f"{name}_q4"] = w_q
        elif bits == 4:
            blocks = tp_blocks if name in COL_PARALLEL else 1
            w_q, s = jax.vmap(
                lambda t, blocks=blocks: quantize_weight_int4(
                    t, blocks=blocks
                )
            )(w)
            layers[f"{name}_q4"] = w_q
        else:
            w_q, s = jax.vmap(quantize_weight)(w)
            layers[f"{name}_q"] = w_q
        layers[f"{name}_s"] = s.astype(jnp.float32)

    out = dict(params)
    out["layers"] = layers

    # lm_head (V, H): logits contract over H. Store as (H, V) int8 (or
    # tile-packed int4 when bits=4) with per-vocab-column scales so the
    # kernel computes h @ W directly. int4 needs the Pallas matvec
    # kernel (ops/pallas/quant_matmul.quant_matvec_int4) — the XLA
    # two-half-dots unpack would materialize the full bf16 matrix;
    # lm_bits=8 (or ASR_LM_BITS=8) keeps the lm_head int8 under bits=4.
    import os

    lm = params["lm_head"]
    if lm_bits is None:
        # group-wise mode defaults the lm_head to int8: the tiled int4
        # matvec's scales are per-column (the same outlier exposure
        # group_size exists to fix), and the lm_head stream is only
        # ~12% of the decode bytes — int8 is the quality-consistent
        # default (ASR_LM_BITS=4 still forces the int4 matvec)
        default_lm = 8 if group_size is not None else bits
        lm_bits = int(os.environ.get("ASR_LM_BITS", default_lm))
    if tp_blocks > 1:
        lm_bits = 8  # the int4 lm matvec is a single-device Pallas kernel
    if lm_bits not in (4, 8):
        raise ValueError(f"lm_bits must be 4 or 8, got {lm_bits}")
    if lm_bits == 4:
        # honored independently of layer bits: the tiled int4 matvec
        # (quant_matvec_int4) only reads the lm_head tensors, so
        # int8 layers + int4 lm_head is a valid combination
        lm_q4, lm_s = quantize_weight_int4_tiled(jnp.transpose(lm))
        out["lm_head_q4"] = lm_q4
        out["lm_head_s"] = lm_s.astype(jnp.float32)
    else:
        lm_q, lm_s = quantize_weight(jnp.transpose(lm))
        out["lm_head_q"] = lm_q
        out["lm_head_s"] = lm_s.astype(jnp.float32)
    del out["lm_head"]
    # engine-prepared lm-fold operands are derived from the lm_head this
    # function just replaced; a stale bf16 copy must not survive (dead
    # HBM weight + wrong-dtype folded tiles). The caller re-prepares.
    out.pop("lm_fold_w", None)
    out.pop("lm_fold_s", None)
    return out


def quantize_lm_head_only(params: PyTree) -> PyTree:
    """bf16 decoder layers + int8 lm_head (``quantize='lm8'``).

    The lm_head matvec streams V*H bytes once per token — at bf16 that
    is ~28% of the 0.6B decode stream. Quantizing ONLY the final linear
    keeps every hidden-state computation at full precision (the mildest
    possible quality knob) while cutting that stream in half.
    """
    out = dict(params)
    lm_q, lm_s = quantize_weight(jnp.transpose(params["lm_head"]))
    out["lm_head_q"] = lm_q
    out["lm_head_s"] = lm_s.astype(jnp.float32)
    del out["lm_head"]
    out.pop("lm_fold_w", None)  # stale: derived from the replaced lm_head
    out.pop("lm_fold_s", None)
    return out


def is_quantized(params: PyTree) -> bool:
    return "lm_head_q" in params or "lm_head_q4" in params


def quant_bits(params: PyTree) -> int:
    """0 (unquantized), 8, or 4 for a decoder param pytree."""
    layers = params.get("layers", {})
    if "q_w_q4" in layers or "qkv_w_q4" in layers:
        return 4
    if "q_w_q" in layers or "qkv_w_q" in layers:
        return 8
    return 0
