"""Parameter sharding specs (Megatron-style tensor parallelism).

Decoder TP layout over the 'tp' mesh axis:
  * q/k/v projections: output (head) dim sharded  -> column parallel
  * o projection:      input (head) dim sharded   -> row parallel (psum)
  * gate/up:           intermediate dim sharded   -> column parallel
  * down:              intermediate dim sharded   -> row parallel (psum)
  * embed / lm_head:   vocab dim sharded (logits all-gather is tiny for
    greedy decode: argmax could even be computed shard-local + psum-max,
    which XLA derives from the annotations)
  * norms:             replicated

The encoder is sharded the same way when its head count divides tp,
otherwise replicated (it is ~10% of total FLOPs; 14 heads does not tile
onto a power-of-two tp).

All leaves default to replicated; only the listed leaves are annotated.
XLA/GSPMD propagates activation shardings and inserts the collectives.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PyTree = Any


def decoder_param_specs(tp_heads_ok: bool = True) -> dict:
    """PartitionSpec pytree matching the decoder param layout."""
    col = P(None, None, "tp") if tp_heads_ok else P()
    row = P(None, "tp", None) if tp_heads_ok else P()
    rep2 = P(None, None)
    return {
        "embed": P("tp", None),
        "layers": {
            "input_ln_w": rep2,
            "post_ln_w": rep2,
            "q_norm_w": rep2,
            "k_norm_w": rep2,
            "q_w": col,
            "k_w": col,
            "v_w": col,
            "o_w": row,
            "gate_w": col,
            "up_w": col,
            "down_w": row,
        },
        "final_ln_w": P(None),
        "lm_head": P("tp", None),
    }


def quantized_decoder_param_specs(tp_heads_ok: bool = True) -> dict:
    """PartitionSpec pytree for an int8-quantized decoder pytree.

    ``{name}_q`` carries the same (L, in, out) layout as the bf16 weight
    it replaces, so it takes the same spec. Per-output-channel scales
    ``{name}_s`` (L, out) shard with the OUTPUT dim: column-parallel
    weights shard them over tp; row-parallel weights (out replicated,
    in sharded) keep scales replicated — the per-output scale commutes
    with the psum over input shards (s * sum(partial) == sum(s * partial)).
    The lm_head is stored transposed (H, V) with (V,) scales, so vocab
    parallelism moves to dim 1 / dim 0 respectively.
    """
    from ..weights.quantize import QUANT_LAYER_WEIGHTS

    base = decoder_param_specs(tp_heads_ok)
    col_s = P(None, "tp") if tp_heads_ok else P()
    rep_s = P(None, None)
    layers = {
        k: v for k, v in base["layers"].items()
        if k not in QUANT_LAYER_WEIGHTS
    }
    for name in QUANT_LAYER_WEIGHTS:
        layers[f"{name}_q"] = base["layers"][name]
        is_col = name in ("q_w", "k_w", "v_w", "gate_w", "up_w")
        layers[f"{name}_s"] = col_s if is_col else rep_s
    return {
        "embed": base["embed"],
        "layers": layers,
        "final_ln_w": base["final_ln_w"],
        "lm_head_q": P(None, "tp"),
        "lm_head_s": P("tp"),
    }


def int4_decoder_param_specs(tp_heads_ok: bool = True) -> dict:
    """PartitionSpec pytree for a blocked-int4 decoder pytree.

    Column-parallel weights are packed block-locally per tp shard
    (quantize_weight_int4 tp_blocks): stored (L, K, blocks, half_b) with
    the BLOCK dim sharded — every unpack op is shard-local, so GSPMD
    partitions the dequant without shuffles. Row-parallel weights pack
    along the (replicated) output dim and shard their input dim as
    usual: (L, K, N/2) with K over tp. The lm_head is int8 (forced by
    quantize_decoder_params under tp_blocks).
    """
    from ..weights.quantize import QUANT_LAYER_WEIGHTS as QUANT_LAYER_NAMES

    base = decoder_param_specs(tp_heads_ok)
    col_blk = P(None, None, "tp", None) if tp_heads_ok else P()
    row = P(None, "tp", None) if tp_heads_ok else P()
    col_s = P(None, "tp") if tp_heads_ok else P()
    rep_s = P(None, None)
    layers = {
        k: v for k, v in base["layers"].items()
        if k not in QUANT_LAYER_NAMES
    }
    for name in QUANT_LAYER_NAMES:
        is_col = name in ("q_w", "k_w", "v_w", "gate_w", "up_w")
        layers[f"{name}_q4"] = col_blk if is_col else row
        layers[f"{name}_s"] = col_s if is_col else rep_s
    return {
        "embed": base["embed"],
        "layers": layers,
        "final_ln_w": base["final_ln_w"],
        "lm_head_q": P(None, "tp"),
        "lm_head_s": P("tp"),
    }


def encoder_param_specs(num_heads: int, tp_size: int) -> dict:
    """PartitionSpec pytree for the encoder; TP only if heads tile onto tp."""
    ok = tp_size > 0 and num_heads % tp_size == 0
    col = P(None, None, "tp") if ok else P()
    row = P(None, "tp", None) if ok else P()
    rep1, rep2 = P(None), P(None, None)
    colb = P(None, "tp") if ok else P()
    return {
        "conv1_w": P(), "conv1_b": P(),
        "conv2_w": P(), "conv2_b": P(),
        "conv3_w": P(), "conv3_b": P(),
        "conv_out_w": rep2, "conv_out_b": rep1,
        "layers": {
            "attn_ln_w": rep2, "attn_ln_b": rep2,
            "ffn_ln_w": rep2, "ffn_ln_b": rep2,
            "q_w": col, "q_b": colb,
            "k_w": col, "k_b": colb,
            "v_w": col, "v_b": colb,
            "out_w": row, "out_b": rep2,
            "fc1_w": col, "fc1_b": colb,
            "fc2_w": row, "fc2_b": rep2,
        },
        "ln_post_w": rep1, "ln_post_b": rep1,
        "proj1_w": rep2, "proj1_b": rep1,
        "proj2_w": rep2, "proj2_b": rep1,
    }


def match_specs(params: PyTree, specs: PyTree) -> PyTree:
    """Align a spec tree to a param tree, defaulting missing keys to P()."""
    if isinstance(params, dict):
        return {
            k: match_specs(
                v, specs.get(k, P()) if isinstance(specs, dict) else P()
            )
            for k, v in params.items()
        }
    return specs if not isinstance(specs, dict) else P()


def shard_params(params: PyTree, mesh: Mesh, specs: PyTree) -> PyTree:
    """device_put every param leaf with its NamedSharding."""

    def walk(p, s):
        if isinstance(p, dict):
            return {
                k: walk(v, s.get(k, P()) if isinstance(s, dict) else P())
                for k, v in p.items()
            }
        spec = s if not isinstance(s, dict) else P()
        return jax.device_put(p, NamedSharding(mesh, spec))

    return walk(params, specs)


def named_shardings(mesh: Mesh, specs: PyTree) -> PyTree:
    """Map a spec tree (dicts of PartitionSpec) to NamedShardings."""

    def walk(s):
        if isinstance(s, dict):
            return {k: walk(v) for k, v in s.items()}
        return NamedSharding(mesh, s)

    return walk(specs)
