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

from ..ops.pallas.quant_matmul import quantize_weight, quantize_weight_int4

PyTree = Any

QUANT_LAYER_WEIGHTS = ("q_w", "k_w", "v_w", "o_w", "gate_w", "up_w", "down_w")


def quantize_decoder_params(params: PyTree, bits: int = 8) -> PyTree:
    """Return a new decoder param pytree with int8 (or int4) linears.

    bits=4 packs each decoder linear two-values-per-int8 (``{name}_q4``,
    see ops/pallas/quant_matmul.quantize_weight_int4) — a QUARTER of the
    bf16 HBM bytes on the decode-dominant weight streams. The lm_head
    stays int8 in both modes: it is read once per token through an XLA
    matvec where nibble unpacking would materialize the full bf16 matrix.
    """
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    layers = dict(params["layers"])
    for name in QUANT_LAYER_WEIGHTS:
        w = layers.pop(name)  # (L, in, out)
        if bits == 4:
            w_q, s = jax.vmap(quantize_weight_int4)(w)
            layers[f"{name}_q4"] = w_q
        else:
            w_q, s = jax.vmap(quantize_weight)(w)
            layers[f"{name}_q"] = w_q
        layers[f"{name}_s"] = s.astype(jnp.float32)

    out = dict(params)
    out["layers"] = layers

    # lm_head (V, H): logits contract over H. Store as (H, V) int8 with
    # per-vocab-column scales so the kernel computes h @ W directly.
    lm = params["lm_head"]
    lm_q, lm_s = quantize_weight(jnp.transpose(lm))
    out["lm_head_q"] = lm_q
    out["lm_head_s"] = lm_s.astype(jnp.float32)
    del out["lm_head"]
    return out


def is_quantized(params: PyTree) -> bool:
    return "lm_head_q" in params


def quant_bits(params: PyTree) -> int:
    """0 (unquantized), 8, or 4 for a decoder param pytree."""
    if "q_w_q4" in params.get("layers", {}):
        return 4
    if "q_w_q" in params.get("layers", {}):
        return 8
    return 0
