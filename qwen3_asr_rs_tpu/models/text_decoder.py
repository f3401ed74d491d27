"""Qwen3 text decoder — TPU-native functional implementation.

Architecture parity targets (reference file:line):
  * GQA attention 16Q/8KV with per-head QK RMSNorm    src/layers.rs:249-347
  * RoPE/MRoPE rotate-half convention                 src/layers.rs:361-375
  * SwiGLU MLP                                        src/layers.rs:381-401
  * pre-norm residual decoder layer                   src/layers.rs:407-464
  * final RMSNorm + (tied) lm_head                    src/text_decoder.rs:90-113

TPU-first design decisions (deliberately NOT the reference's):
  * all 28 layers are stacked along a leading axis and driven by one
    `lax.scan`, so the compiled graph is layer-count independent;
  * the KV cache is a preallocated slab written with
    `lax.dynamic_update_slice` (the reference concat-grows per step,
    src/layers.rs:311-317);
  * GQA is computed with grouped einsums — repeated K/V heads are never
    materialized (the reference repeat-expands, src/layers.rs:350-358);
  * prefill attends over the fresh (B, S) keys with a causal mask;
    decode attends over the slab with a slot-validity mask — both produce
    identical numerics to the reference masks.

Parameters are a plain pytree of jnp arrays; linear weights are stored
(in_features, out_features) so forwards are `x @ w`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TextDecoderConfig
from ..ops.attention import attention
from ..ops.norms import rms_norm
from ..ops.rotary import RotaryTable, apply_rotary

PyTree = Any


@dataclasses.dataclass
class KVCache:
    """Preallocated slab KV cache.

    k, v: (num_layers, batch, num_kv_heads, max_len, head_dim)

    The head dim sits OUTSIDE the slot dim so decode attention can run
    ONE batched `dot_general` over all KV heads per layer: Mosaic lowers
    batched dots natively, and the (Hkv, S, D) layout measured ~18x
    faster per layer than a per-head python loop over an (S, Hkv, D)
    slab (an in-kernel transpose costs more than it saves).

    With ``kv_dtype='int8'`` (AsrEngine / ASR_KV=int8) k and v are int8
    with per-(layer, batch, head, slot) symmetric scales in
    ``k_scale``/``v_scale`` (f32, (L, B, Hkv, S)): HALF the slab HBM
    stream per decode step and double the slot capacity per byte.
    Dequantization (``value = int8 * scale``) happens at the attention
    site — in VMEM inside the kernels, fused into the einsums in the
    XLA paths.
    """

    k: jax.Array
    v: jax.Array
    k_scale: jax.Array | None = None
    v_scale: jax.Array | None = None

    @classmethod
    def zeros(
        cls,
        cfg: TextDecoderConfig,
        batch: int,
        max_len: int,
        dtype=jnp.bfloat16,
        quantized: bool = False,
    ) -> "KVCache":
        shape = (
            cfg.num_hidden_layers,
            batch,
            cfg.num_key_value_heads,
            max_len,
            cfg.head_dim,
        )
        if quantized:
            return cls(
                k=jnp.zeros(shape, jnp.int8),
                v=jnp.zeros(shape, jnp.int8),
                k_scale=jnp.zeros(shape[:-1], jnp.float32),
                v_scale=jnp.zeros(shape[:-1], jnp.float32),
            )
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def max_len(self) -> int:
        return self.k.shape[3]


jax.tree_util.register_dataclass(
    KVCache, data_fields=["k", "v", "k_scale", "v_scale"], meta_fields=[]
)


def quantize_kv(t):
    """Symmetric int8 per-(…, slot) quantization over the last (D) axis.

    t: (..., D) float -> (int8 (..., D), scale f32 (...,)).
    """
    tf = t.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(tf), axis=-1)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(
        jnp.round(tf / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def dequantize_kv(q, scale, dtype):
    """int8 (..., D) * f32 scale (...,) -> dtype (..., D)."""
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


def _interpret_pallas() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _linear(tree: PyTree, name: str, x):
    """x @ W for a bf16 weight or an int8-quantized (W_q, scales) pair.

    The quantized branch dequantizes through XLA (int8 values are exact
    in the compute dtype; the per-channel scale applies after the
    contraction). This path runs for prefill and for decode fallbacks —
    the decode hot loop reads int8 directly inside the megakernel
    (ops/pallas/decode_layer.py), where dequant overlaps the weight DMA.
    """
    if f"{name}_q" in tree:
        w = tree[f"{name}_q"].astype(x.dtype)
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return (y * tree[f"{name}_s"].astype(jnp.float32)).astype(x.dtype)
    if f"{name}_q4" in tree:
        p4 = tree[f"{name}_q4"]
        scales = tree[f"{name}_s"]
        if p4.ndim == 2 and scales.ndim == 2:
            # group-wise scales (quantize='int4g'): batched per-group
            # dots, scales contracted after (quant_matmul
            # int4_grouped_matmul) — scales vary along K so the usual
            # post-dot per-column apply does not commute
            from ..ops.pallas.quant_matmul import int4_grouped_matmul

            return int4_grouped_matmul(x, p4, scales).astype(x.dtype)
        if p4.ndim == 3:
            # blocked tensor-parallel layout (K, blocks, half_b): every
            # unpack op is block-local, so GSPMD shards the dequant over
            # tp with the block dim (quantize_weight_int4 blocks>1)
            from ..ops.pallas.quant_matmul import unpack_int4_blocked

            w = unpack_int4_blocked(p4, x.dtype)
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            return (
                y * tree[f"{name}_s"].astype(jnp.float32)
            ).astype(x.dtype)
        # nibble-packed int4: two half-width dots on the sign-extended
        # nibbles, concatenated along the output dim (packing pairs
        # column j with column j + N/2, so order is preserved)
        p = p4.astype(jnp.int32)
        lo = ((p << 28) >> 28).astype(x.dtype)
        hi = (p >> 4).astype(x.dtype)
        y = jnp.concatenate(
            [
                jnp.dot(x, lo, preferred_element_type=jnp.float32),
                jnp.dot(x, hi, preferred_element_type=jnp.float32),
            ],
            axis=-1,
        )
        return (y * tree[f"{name}_s"].astype(jnp.float32)).astype(x.dtype)
    return x @ tree[name]


def _qkv(layer: PyTree, name: str, x, num_heads: int, head_dim: int):
    """Project and split into heads: (B, S, H*D) -> (B, S, H, D)."""
    b, s, _ = x.shape
    out = _linear(layer, f"{name}_w", x)
    bias = layer.get(f"{name}_b")
    if bias is not None:
        out = out + bias
    return out.reshape(b, s, num_heads, head_dim)


def _qkv3(layer: PyTree, x, nq: int, nkv: int, head_dim: int):
    """All three q/k/v projections: (B, S, H) -> three (B, S, heads, D).

    When the quantizer merged the projections (``qkv_w_q``/``qkv_w_q4``,
    weights/quantize.MERGED_GROUPS) this is ONE wider matmul plus
    activation slicing — identical numerics to three separate dots.
    """
    if "qkv_w_q" in layer or "qkv_w_q4" in layer:
        b, s, _ = x.shape
        out = _linear(layer, "qkv_w", x)
        q, k, v = jnp.split(
            out, [nq * head_dim, (nq + nkv) * head_dim], axis=-1
        )
        return (
            q.reshape(b, s, nq, head_dim),
            k.reshape(b, s, nkv, head_dim),
            v.reshape(b, s, nkv, head_dim),
        )
    return (
        _qkv(layer, "q", x, nq, head_dim),
        _qkv(layer, "k", x, nkv, head_dim),
        _qkv(layer, "v", x, nkv, head_dim),
    )


def _store_kv(kv, k, v, start=0):
    """Write fresh K/V (B, S, H, D) into a per-layer slab 4-tuple.

    kv = (k_cache, v_cache, k_scale, v_scale) with (B, Hkv, S, D) slabs;
    scales are None for bf16 caches. Returns the updated 4-tuple.
    """
    k_cache, v_cache, ks_c, vs_c = kv
    kt = jnp.transpose(k, (0, 2, 1, 3))  # (B, H, S, D)
    vt = jnp.transpose(v, (0, 2, 1, 3))
    if ks_c is not None:
        kq, ks = quantize_kv(kt)
        vq, vs = quantize_kv(vt)
        return (
            jax.lax.dynamic_update_slice(k_cache, kq, (0, 0, start, 0)),
            jax.lax.dynamic_update_slice(v_cache, vq, (0, 0, start, 0)),
            jax.lax.dynamic_update_slice(ks_c, ks, (0, 0, start)),
            jax.lax.dynamic_update_slice(vs_c, vs, (0, 0, start)),
        )
    return (
        jax.lax.dynamic_update_slice(
            k_cache, kt.astype(k_cache.dtype), (0, 0, start, 0)
        ),
        jax.lax.dynamic_update_slice(
            v_cache, vt.astype(v_cache.dtype), (0, 0, start, 0)
        ),
        None,
        None,
    )


def _load_kv(kv, dtype):
    """Dequantized (or cast) slab pair from a per-layer 4-tuple."""
    k_cache, v_cache, ks_c, vs_c = kv
    if ks_c is not None:
        return (
            dequantize_kv(k_cache, ks_c, dtype),
            dequantize_kv(v_cache, vs_c, dtype),
        )
    return k_cache.astype(dtype), v_cache.astype(dtype)


def _gate_up(layer: PyTree, x):
    """silu(gate(x)) * up(x), through merged ``gateup_w`` when present."""
    if "gateup_w_q" in layer or "gateup_w_q4" in layer:
        out = _linear(layer, "gateup_w", x)
        gate, up = jnp.split(out, 2, axis=-1)
        return jax.nn.silu(gate) * up
    return jax.nn.silu(_linear(layer, "gate_w", x)) * _linear(
        layer, "up_w", x
    )


class TextDecoder:
    """Stateless decoder; parameters are passed to every call."""

    def __init__(self, cfg: TextDecoderConfig, max_position: int = 8192,
                 unroll_layers: bool = False):
        self.cfg = cfg
        self.unroll_layers = unroll_layers
        # Set by the engine when running under a GSPMD mesh: the Pallas
        # kernels are single-device programs, so sharded graphs use the
        # XLA paths (which GSPMD partitions) unless explicitly forced.
        self.prefer_xla = False
        self.rotary = RotaryTable(
            head_dim=cfg.head_dim,
            rope_theta=cfg.rope_theta,
            mrope_section=cfg.mrope_section(),
            interleaved=cfg.mrope_interleaved(),
            max_position=max_position,
        )

    # ------------------------------------------------------------------ #

    def embed(self, params: PyTree, input_ids):
        """Token embedding lookup (reference src/text_decoder.rs:90-92)."""
        return params["embed"][input_ids]

    def _layer(
        self,
        layer: PyTree,
        x,
        cos,
        sin,
        kv,  # per-layer (k_cache, v_cache, k_scale, v_scale)
    ):
        """One prefill/full-forward layer. Returns (hidden, kv).

        Writes the fresh K/V at slot 0..S and attends causally over the
        fresh keys (decode steps use _decode_layer* instead).
        """
        cfg = self.cfg
        residual = x
        h = rms_norm(x, layer["input_ln_w"], cfg.rms_norm_eps)

        q, k, v = _qkv3(
            layer, h, cfg.num_attention_heads, cfg.num_key_value_heads,
            cfg.head_dim,
        )

        # Per-head QK RMSNorm (src/layers.rs:303-304)
        q = rms_norm(q, layer["q_norm_w"], cfg.rms_norm_eps)
        k = rms_norm(k, layer["k_norm_w"], cfg.rms_norm_eps)

        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)

        kv = _store_kv(kv, k, v)

        attn = attention(q, k, v, causal=True)

        b, s, _, _ = attn.shape
        attn = attn.reshape(b, s, cfg.num_attention_heads * cfg.head_dim)
        o = _linear(layer, "o_w", attn)
        x = residual + o

        residual = x
        h = rms_norm(x, layer["post_ln_w"], cfg.rms_norm_eps)
        h = _linear(layer, "down_w", _gate_up(layer, h))
        return residual + h, kv

    def _run_layers(self, params, hidden, cos, sin, cache, remat=False):
        xs = (
            params["layers"], cache.k, cache.v,
            cache.k_scale, cache.v_scale,
        )
        if self.unroll_layers:
            # Unrolled python loop: each layer's weights are static slices
            # of the stacked arrays, which XLA fuses into the consumers
            # with no copy. Slightly better weight streaming at ~5x the
            # compile time; opt-in.
            num_layers = cache.k.shape[0]
            out = cache
            h = hidden
            for i in range(num_layers):
                layer = {k: v[i] for k, v in params["layers"].items()}
                kv_i = (
                    out.k[i], out.v[i],
                    None if out.k_scale is None else out.k_scale[i],
                    None if out.v_scale is None else out.v_scale[i],
                )
                h, kv_i = self._layer(layer, h, cos, sin, kv_i)
                out = KVCache(
                    k=out.k.at[i].set(kv_i[0]),
                    v=out.v.at[i].set(kv_i[1]),
                    k_scale=(
                        None if kv_i[2] is None
                        else out.k_scale.at[i].set(kv_i[2])
                    ),
                    v_scale=(
                        None if kv_i[3] is None
                        else out.v_scale.at[i].set(kv_i[3])
                    ),
                )
            return h, out

        def body(h, xs_i):
            layer, k_c, v_c, ks_c, vs_c = xs_i
            h, kv = self._layer(layer, h, cos, sin, (k_c, v_c, ks_c, vs_c))
            return h, kv

        if remat:
            # training: save only each layer's input, recompute the layer
            # in the backward pass — activation memory drops from
            # O(layers) to O(1) layer for ~1/3 extra forward FLOPs
            body = jax.checkpoint(
                body, policy=jax.checkpoint_policies.nothing_saveable
            )
        hidden, (k, v, ks, vs) = jax.lax.scan(body, hidden, xs)
        return hidden, KVCache(k=k, v=v, k_scale=ks, v_scale=vs)

    def logits(self, params: PyTree, hidden):
        """Final norm + lm head, computed in f32 (argmax parity)."""
        h = rms_norm(hidden, params["final_ln_w"], self.cfg.rms_norm_eps)
        if "lm_head_q4" in params:
            # tile-packed int4: HALF the int8 HBM stream, nibble unpack
            # in VMEM (the XLA unpack would materialize bf16 in HBM)
            from ..ops.pallas.quant_matmul import quant_matvec_int4

            b, s, hd = h.shape
            y = quant_matvec_int4(
                h.reshape(b * s, hd),
                params["lm_head_q4"],
                params["lm_head_s"],
                interpret=_interpret_pallas(),
            )
            return y.reshape(b, s, -1)
        if "lm_head_q" in params:
            # XLA dequant (see _linear): int8 is exact in the compute
            # dtype, per-vocab-column scale applied after the contraction
            y = jnp.dot(
                h, params["lm_head_q"].astype(h.dtype),
                preferred_element_type=jnp.float32,
            )
            return y * params["lm_head_s"].astype(jnp.float32)
        return jnp.einsum(
            "bsh,vh->bsv", h, params["lm_head"],
            preferred_element_type=jnp.float32,
        )

    # ------------------------------------------------------------------ #

    def prefill(
        self,
        params: PyTree,
        hidden,  # (B, P, hidden) — embeddings with audio injection done
        position_ids,  # (P,) or (3, P)
        cache: KVCache,
        true_len,  # scalar or (B,) int32: true prompt length(s) (<= P)
    ):
        """Full-sequence prefill. Writes cache[0:P], returns (logits_last, cache).

        Causal mask only — the padded suffix [true_len, P) self-attends
        causally to garbage but those query rows are discarded, and their
        cache slots are overwritten by subsequent decode steps.
        """
        cos, sin = self.rotary.lookup(position_ids)
        hidden, cache = self._run_layers(params, hidden, cos, sin, cache)
        if jnp.ndim(true_len) == 0:
            last = jax.lax.dynamic_slice_in_dim(
                hidden, true_len - 1, 1, axis=1
            )
        else:
            last = jnp.take_along_axis(
                hidden, (true_len - 1)[:, None, None], axis=1
            )
        return self.logits(params, last)[:, 0], cache

    def prefill_chunk(
        self,
        params: PyTree,
        hidden,    # (B, P, hidden) — embeddings for positions [start, start+P)
        start,     # traced scalar int32: absolute position of hidden[:, 0]
        cache: KVCache,
        true_len,  # traced scalar int32: valid chunk length (<= P)
    ):
        """Incremental (chunked) prefill extending an existing cache.

        Slab slots [0, start) must already hold valid K/V; this writes
        slots [start, start+P) and each chunk query i attends to key slot
        j iff j <= start + i — i.e. the full history plus the fresh block
        causally. Slots past start+P are never attendable. This is what
        makes streaming reuse possible: only the changed suffix of the
        prompt is recomputed (the reference has no incremental path —
        src/inference.rs:139-149 prefills the whole prompt every time).

        Returns (logits at chunk index true_len - 1, cache).
        """
        b, p_len, _ = hidden.shape
        positions = start + jnp.arange(p_len)
        cos, sin = self.rotary.lookup(positions)

        def body(h, xs):
            layer, k_c, v_c, ks_c, vs_c = xs
            h, kv = self._chunk_layer(
                layer, h, cos, sin, (k_c, v_c, ks_c, vs_c), start
            )
            return h, kv

        hidden, (k, v, ks, vs) = jax.lax.scan(
            body, hidden,
            (params["layers"], cache.k, cache.v,
             cache.k_scale, cache.v_scale),
        )
        last = jax.lax.dynamic_slice_in_dim(hidden, true_len - 1, 1, axis=1)
        return (
            self.logits(params, last)[:, 0],
            KVCache(k=k, v=v, k_scale=ks, v_scale=vs),
        )

    def score_chunk(
        self,
        params: PyTree,
        token_ids,  # (B, P) int32 — a block of already-chosen tokens
        start,      # traced scalar int32: absolute position of block[:, 0]
        cache: KVCache,
        return_logits: bool = False,
    ):
        """Greedy-score a token block in ONE call: argmax at EVERY position.

        The verification step of speculative decoding: feed the block
        [last_accepted, d_1, .., d_k] at positions [start, start+P); the
        returned tokens t_i are the model's greedy continuation after
        each prefix — t_i == argmax P(. | history, block[:, :i+1]) — and
        the block's K/V land in slab slots [start, start+P) exactly as a
        sequential decode would have written them (same _chunk_layer
        masks as prefill_chunk, so numerics match decode_step token for
        token). Rejected-draft slots are overwritten by the next
        iteration's block before they are ever attendable.

        Returns (tokens (B, P) int32, cache) — or, with
        ``return_logits``, ((B, P, V) f32 logits, cache): the
        speculative-SAMPLING verify needs the full target distribution
        at every position, not just its argmax.
        """
        b, p_len = token_ids.shape
        hidden = self.embed(params, token_ids)
        positions = start + jnp.arange(p_len)
        cos, sin = self.rotary.lookup(positions)

        def body(h, xs):
            layer, k_c, v_c, ks_c, vs_c = xs
            h, kv = self._chunk_layer(
                layer, h, cos, sin, (k_c, v_c, ks_c, vs_c), start
            )
            return h, kv

        hidden, (k, v, ks, vs) = jax.lax.scan(
            body, hidden,
            (params["layers"], cache.k, cache.v,
             cache.k_scale, cache.v_scale),
        )
        logits = self.logits(params, hidden)  # (B, P, V) f32
        out = (
            logits if return_logits
            else jnp.argmax(logits, axis=-1).astype(jnp.int32)
        )
        return out, KVCache(k=k, v=v, k_scale=ks, v_scale=vs)

    def _chunk_layer(self, layer, x, cos, sin, kv, start):
        """One layer of chunked prefill: write-at-start + history attention."""
        cfg = self.cfg
        b, p_len, _ = x.shape
        nq, nkv, hd = (
            cfg.num_attention_heads,
            cfg.num_key_value_heads,
            cfg.head_dim,
        )
        groups = nq // nkv
        residual = x
        h = rms_norm(x, layer["input_ln_w"], cfg.rms_norm_eps)
        q, k, v = _qkv3(layer, h, nq, nkv, hd)
        q = rms_norm(q, layer["q_norm_w"], cfg.rms_norm_eps)
        k = rms_norm(k, layer["k_norm_w"], cfg.rms_norm_eps)
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)

        # write the fresh block FIRST, then attend over the slab: key slot
        # j is attendable by chunk query i iff j <= start + i, which covers
        # both the history [0, start) and the fresh block causally.
        kv = _store_kv(kv, k, v, start)
        k_use, v_use = _load_kv(kv, q.dtype)

        s_max = k_use.shape[2]
        scale = hd ** -0.5
        qg = q.reshape(b, p_len, nkv, groups, hd)
        sc = jnp.einsum(
            "bqhgd,bhkd->bhgqk", qg, k_use,
            preferred_element_type=jnp.float32,
        ) * scale
        ok = (
            jnp.arange(s_max)[None, :]
            <= start + jnp.arange(p_len)[:, None]
        )  # (P, S)
        sc = jnp.where(ok[None, None, None, :, :], sc, -1e9)
        m = jnp.max(sc, -1, keepdims=True)
        p = jnp.exp(sc - m)
        p = p / jnp.sum(p, -1, keepdims=True)
        out = jnp.einsum(
            "bhgqk,bhkd->bqhgd", p.astype(v_use.dtype),
            v_use,
            preferred_element_type=jnp.float32,
        )
        out = out.reshape(b, p_len, nq * hd).astype(x.dtype)
        x = residual + _linear(layer, "o_w", out)
        residual = x
        h = rms_norm(x, layer["post_ln_w"], cfg.rms_norm_eps)
        h = _linear(layer, "down_w", _gate_up(layer, h))
        return residual + h, kv

    def decode_step(
        self,
        params: PyTree,
        token_ids,  # (B,) int32
        pos,  # scalar or (B,) int32: this token's position (== cur length)
        cache: KVCache,
    ):
        """Single greedy decode step. Returns (logits (B, V), cache).

        The layer scan reads the *stale* cache slab and adds the current
        token's attention contribution explicitly (same softmax key set,
        identical numerics); the fresh K/V of all layers are written into
        the slab with ONE update after the scan. Keeping the slabs out of
        the scan carry avoids per-layer slab writeback traffic (~5%
        decode time measured on v5e).
        """
        b = token_ids.shape[0]
        hidden = self.embed(params, token_ids)[:, None, :]  # (B, 1, H)
        if jnp.ndim(pos) == 0:
            cos, sin = self.rotary.lookup(pos[None])  # (1, D) shared
        else:
            c, s = self.rotary.lookup(pos)  # (B, D)
            cos, sin = c[:, None, :], s[:, None, :]  # (B, 1, D)
        # stale-slab validity: slots [0, pos) hold earlier tokens
        kv_valid = jnp.broadcast_to(pos, (b,)).astype(jnp.int32)
        if nt := self._use_fused_step(params, b, pos, cache):
            from ..ops.pallas.decode_layer import decode_layers_fused

            cos_b = jnp.broadcast_to(cos, (b, cos.shape[-1]))
            sin_b = jnp.broadcast_to(sin, (b, sin.shape[-1]))
            h2, ks, vs = decode_layers_fused(
                hidden[:, 0], cos_b, sin_b, params["layers"],
                cache.k, cache.v, None, pos,
                eps=self.cfg.rms_norm_eps,
                interpret=_interpret_pallas(),
                k_scales=cache.k_scale, v_scales=cache.v_scale,
                ffn_tiles=nt,
            )
            hidden = h2[:, None, :]
        else:
            hidden, ks, vs = self._decode_scan(
                params, hidden, cos, sin, cache, None, kv_valid
            )
        cache = self._write_token_kv(cache, ks, vs, pos)
        return self.logits(params, hidden)[:, 0], cache

    def _write_token_kv(self, cache: KVCache, ks, vs, pos) -> KVCache:
        """Write one token's fresh K/V (L, B, Hkv, D) for all layers.

        ``pos`` scalar: one dynamic_update_slice at a shared slot.
        ``pos`` (B,): per-example scatter. int8 caches quantize here
        (per layer/example/head symmetric scale over D).
        """
        if cache.quantized:
            kq, kscale = quantize_kv(ks)
            vq, vscale = quantize_kv(vs)
        else:
            kq, vq = ks.astype(cache.k.dtype), vs.astype(cache.v.dtype)
            kscale = vscale = None
        if jnp.ndim(pos) == 0:
            k_new = jax.lax.dynamic_update_slice(
                cache.k, kq[:, :, :, None], (0, 0, 0, pos, 0)
            )
            v_new = jax.lax.dynamic_update_slice(
                cache.v, vq[:, :, :, None], (0, 0, 0, pos, 0)
            )
            ks_new = vs_new = None
            if cache.quantized:
                ks_new = jax.lax.dynamic_update_slice(
                    cache.k_scale, kscale[:, :, :, None], (0, 0, 0, pos)
                )
                vs_new = jax.lax.dynamic_update_slice(
                    cache.v_scale, vscale[:, :, :, None], (0, 0, 0, pos)
                )
            return KVCache(k=k_new, v=v_new, k_scale=ks_new, v_scale=vs_new)
        b = ks.shape[1]
        barange = jnp.arange(b)
        # advanced indices split by a slice put the broadcast (B,) dim
        # first: indexed subspace is (B, L, Hkv[, D])
        k_new = cache.k.at[:, barange, :, pos].set(jnp.swapaxes(kq, 0, 1))
        v_new = cache.v.at[:, barange, :, pos].set(jnp.swapaxes(vq, 0, 1))
        ks_new = vs_new = None
        if cache.quantized:
            ks_new = cache.k_scale.at[:, barange, :, pos].set(
                jnp.swapaxes(kscale, 0, 1)
            )
            vs_new = cache.v_scale.at[:, barange, :, pos].set(
                jnp.swapaxes(vscale, 0, 1)
            )
        return KVCache(k=k_new, v=v_new, k_scale=ks_new, v_scale=vs_new)

    def _fused_step_tiles(self, params, b: int, cache: KVCache,
                          fold_lm: bool = False) -> int:
        """Smallest ffn_tiles whose megakernel blocks fit the VMEM budget.

        Returns 0 when no tiling fits (scan fallback), 1 for the whole-
        layer kernel, or 2/4/8 for layer-split FFN streaming (1.7B bf16:
        ~100 MB/layer exceeds the budget whole, tiles of inter/4 fit).
        Pallas double-buffers every per-layer weight block, the manual
        attention DMA uses a double-buffered (2, B, BS, Hkv, D) scratch
        pair (the slab itself stays in HBM), and lm-head folding adds a
        double-buffered vocab tile. If the total exceeded the kernel's
        vmem_limit_bytes Mosaic compilation would fail at runtime.
        Split mode requires unmerged non-int4 params (see
        decode_layers_fused); ASR_FFN_TILES forces a specific value.
        """
        import os

        from ..ops.pallas.decode_layer import LM_TILE, VMEM_LIMIT_BYTES

        cfg = self.cfg
        layers = params["layers"]
        int4 = "q_w_q4" in layers or "qkv_w_q4" in layers
        if int4 and layers.get("q_w_q4", layers.get("qkv_w_q4")).ndim == 4:
            return 0  # blocked tp layout: megakernel unpack assumes N/2 pairs
        merged = "qkv_w_q" in layers or "qkv_w_q4" in layers
        if int4:
            wbytes = 0.5  # two weights per int8 byte
        elif "q_w_q" in layers or "qkv_w_q" in layers:
            wbytes = 1
        else:
            wbytes = jnp.dtype(layers["q_w"].dtype).itemsize
        h, d = cfg.hidden_size, cfg.head_dim
        nq_d = cfg.num_attention_heads * d
        nkv_d = cfg.num_key_value_heads * d
        inter = cfg.intermediate_size
        attn_w_elems = (
            h * nq_d            # q_w
            + 2 * h * nkv_d     # k_w, v_w
            + nq_d * h          # o_w
        )
        ffn_w_elems = 3 * h * inter  # gate_w, up_w, down_w
        gs_bytes = 0
        if int4 and "qkv_w_s" in layers and layers["qkv_w_s"].ndim == 3:
            # grouped int4: four (G_w, N_w) f32 scale blocks ride the
            # per-layer pipeline (merged layout; guarded by the caller)
            gs = h // layers["qkv_w_s"].shape[1]
            gs_bytes = 4 * (
                (h // gs) * (nq_d + 2 * nkv_d)
                + (nq_d // gs) * h
                + (h // gs) * 2 * inter
                + (inter // gs) * h
            )
        slab_bytes = jnp.dtype(cache.k.dtype).itemsize
        block_s = min(512 if b == 1 else 128, cache.max_len)
        attn_bufs = (
            2 * 2 * b * block_s * cfg.num_key_value_heads * d * slab_bytes
        )
        if cache.quantized:
            # double-buffered per-layer (1, B, Hkv, S) f32 scale blocks
            attn_bufs += (
                2 * 2 * b * cfg.num_key_value_heads * cache.max_len * 4
            )
        kv_out_bytes = 2 * b * nkv_d * slab_bytes
        lm_bufs = 0
        if fold_lm:
            if "lm_head_q" in params:
                lm_bytes = 1
            elif "lm_head" in params:
                lm_bytes = jnp.dtype(params["lm_head"].dtype).itemsize
            else:
                lm_bytes = 2
            lm_bufs = 2 * (h * LM_TILE * lm_bytes + 8 * LM_TILE * 4)
        const = (
            2 * max(8, b) * h * 4        # f32 hidden + ffn-acc scratch
            + 2 * max(8, b) * 128 * 4    # argmax scratch
            + b * (h + 2 * d) * wbytes   # x, cos, sin blocks
            + 2 * 8 * max(nq_d, inter, h) * 4  # packed norms + scales
        )
        forced = int(os.environ.get("ASR_FFN_TILES", "0"))
        if forced:
            # ineligible overrides degrade to the scan path like every
            # other ineligible case (decode_layers_fused would RAISE on
            # a misaligned tile, killing the whole transcribe graph);
            # Mosaic needs 128-lane tiles, interpret mode (CPU parity
            # tests at tiny shapes) only an even split
            if forced > 1 and (
                merged or int4 or inter % forced
                or (not _interpret_pallas() and (inter // forced) % 128)
            ):
                return 0
            return forced
        fitting = []
        for nt in (1, 2, 4, 8, 16):
            if nt > 1:
                if merged or int4:
                    break  # split needs unmerged non-int4 params
                if inter % nt or (inter // nt) % 128:
                    continue
            per_layer = (
                (attn_w_elems + ffn_w_elems // nt) * wbytes
                + gs_bytes + kv_out_bytes
            )
            total = 2 * per_layer + attn_bufs + lm_bufs + const
            if total <= VMEM_LIMIT_BYTES:
                if nt == 1:
                    return 1  # whole layer: no split overhead
                fitting.append(nt)
        if not fitting:
            return 0
        # forced to split: prefer ~10 MB gate/up tiles — measured at
        # 1.7B bf16 (tiles 18.9 / 9.4 / 4.7 MB -> 5.04 / 4.88 / 5.02
        # ms/token): big tiles double-buffer poorly against the VMEM
        # ceiling, tiny tiles pay per-sub-step overhead
        target = 10 * 1024 * 1024
        return min(
            fitting,
            key=lambda nt: abs(3 * h * (inter // nt) * wbytes - target),
        )

    def _use_fused_step(self, params, b: int, pos, cache: KVCache,
                        fold_lm: bool = False) -> int:
        """ffn_tiles for the single-pallas-call decode megakernel, 0 = no.

        Eligibility: shared scalar write slot, stacked (possibly int8)
        weights, no attention biases, and a slab whose double-buffered
        blocks fit the kernel's VMEM budget (_fused_step_tiles; a
        return of 2/4/8 selects layer-split FFN streaming for models
        too large to hold a whole layer in VMEM).
        ASR_DECODE_IMPL=scan|fused overrides 'auto'.
        """
        import os

        impl = os.environ.get("ASR_DECODE_IMPL", "auto")
        if impl == "scan":
            return 0
        if fold_lm and "lm_head_q4" in params:
            # the folded lm tiles read int8/bf16; int4 lm_head goes
            # through quant_matvec_int4 instead
            return 0
        eligible = (
            jnp.ndim(pos) == 0  # shared write slot (B=1 or aligned batch)
            and any(
                n in params["layers"]
                for n in ("q_w", "q_w_q", "q_w_q4", "qkv_w_q", "qkv_w_q4")
            )
            and "q_b" not in params["layers"]
            # group-wise int4 scales ((L, G, N) instead of (L, N)): the
            # megakernel dequantizes them per group in VMEM, but only
            # in the MERGED layout — unmerged int4g keeps the scan path
            and (
                "qkv_w_q4" in params["layers"]
                or not any(
                    n.endswith("_s") and getattr(v, "ndim", 0) == 3
                    for n, v in params["layers"].items()
                )
            )
        )
        nt = (
            self._fused_step_tiles(params, b, cache, fold_lm)
            if eligible else 0
        )
        if impl == "fused":
            return nt
        # auto: only on TPU, and only for lane-aligned head dims — Mosaic
        # cannot shape-cast the in-kernel (B, H*D) -> (B*H, D) reshape when
        # D < 128 (found driving the CLI with a tiny test model on chip)
        if (
            self.prefer_xla
            or self.cfg.head_dim % 128 != 0
            or jax.default_backend() not in ("tpu", "axon")
        ):
            return 0
        return nt

    def decode_step_token(
        self,
        params: PyTree,
        token_ids,  # (B,) int32
        pos,        # scalar or (B,) int32
        cache: KVCache,
    ):
        """Greedy decode step emitting the NEXT TOKEN ID directly.

        With ASR_FOLD_LM=1 and the megakernel eligible, the final RMSNorm
        + lm_head matvec + argmax are folded into the same pallas_call
        (extra vocab-tile grid steps) so no logits tensor round-trips
        HBM. The engine prepares the padded lm operands once
        (prepare_lm_fold); without that, the in-call transpose/pad put a
        full lm_head copy in the decode loop (round-2's "fold is slower"
        was entirely that copy). With prepared operands the fold is at
        parity with the separate XLA matvec+argmax (scripts/bench_fold.py,
        round 3: bf16 1.74 vs 1.73, int8 1.00 vs 0.98 ms/token), so it
        stays opt-in — parity does not pay for the duplicate padded
        lm_head in HBM. Default: decode_step + XLA argmax (identical
        semantics).
        Returns (token_ids (B,) int32, cache).
        """
        import os

        b = token_ids.shape[0]
        if os.environ.get("ASR_FOLD_LM") == "1" and (
            nt := self._use_fused_step(params, b, pos, cache, fold_lm=True)
        ):
            from ..ops.pallas.decode_layer import decode_layers_fused

            hidden = self.embed(params, token_ids)
            cos, sin = self.rotary.lookup(jnp.asarray(pos)[None])
            cos_b = jnp.broadcast_to(cos, (b, cos.shape[-1]))
            sin_b = jnp.broadcast_to(sin, (b, sin.shape[-1]))
            lm_w, lm_s, prepared, lm_v = self._lm_fold_operands(params)
            tok, ks, vs = decode_layers_fused(
                hidden, cos_b, sin_b, params["layers"],
                cache.k, cache.v, None, pos,
                eps=self.cfg.rms_norm_eps,
                interpret=_interpret_pallas(),
                fold_lm=True,
                final_ln_w=params["final_ln_w"],
                lm_head=lm_w,
                lm_scales=lm_s,
                lm_prepared=prepared,
                lm_v=lm_v,
                k_scales=cache.k_scale, v_scales=cache.v_scale,
                ffn_tiles=nt,
            )
            cache = self._write_fresh(cache, ks, vs, pos)
            return tok, cache
        logits, cache = self.decode_step(params, token_ids, pos, cache)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    def decode_step_aligned_token(
        self,
        params: PyTree,
        token_ids,  # (B,) int32
        slot,       # SCALAR int32: shared write slot (== P + step)
        kv_start,   # (B,) int32
        cache: KVCache,
    ):
        """Right-aligned decode_step_token (see decode_step_aligned)."""
        import os

        b = token_ids.shape[0]
        if os.environ.get("ASR_FOLD_LM") == "1" and (
            nt := self._use_fused_step(params, b, slot, cache, fold_lm=True)
        ):
            from ..ops.pallas.decode_layer import decode_layers_fused

            hidden = self.embed(params, token_ids)
            positions = (slot - kv_start)[:, None]
            cos, sin = self.rotary.lookup_batch(positions)
            b_arr = jnp.broadcast_to(slot, (b,)).astype(jnp.int32)
            lm_w, lm_s, prepared, lm_v = self._lm_fold_operands(params)
            tok, ks, vs = decode_layers_fused(
                hidden, cos[:, 0], sin[:, 0], params["layers"],
                cache.k, cache.v, kv_start.astype(jnp.int32), b_arr,
                eps=self.cfg.rms_norm_eps,
                interpret=_interpret_pallas(),
                fold_lm=True,
                final_ln_w=params["final_ln_w"],
                lm_head=lm_w,
                lm_scales=lm_s,
                lm_prepared=prepared,
                lm_v=lm_v,
                k_scales=cache.k_scale, v_scales=cache.v_scale,
                ffn_tiles=nt,
            )
            cache = self._write_fresh(cache, ks, vs, slot)
            return tok, cache
        logits, cache = self.decode_step_aligned(
            params, token_ids, slot, kv_start, cache
        )
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    def _write_fresh(self, cache: KVCache, ks, vs, slot) -> KVCache:
        """One slab write of all layers' fresh K/V at a shared slot."""
        return self._write_token_kv(cache, ks, vs, slot)

    @staticmethod
    def _lm_fold_operands(params: PyTree):
        """(lm_head, lm_scales, lm_prepared, lm_v) for the folded step.

        Prefers the engine-prepared padded operands (``lm_fold_w`` /
        ``lm_fold_s`` from decode_layer.prepare_lm_fold): preparing
        inside the per-token call leaves a full lm_head transpose+pad
        in the decode loop body unless XLA hoists it.
        """
        if "lm_fold_w" in params:
            if "lm_head" in params:          # bf16/f32 (V, H)
                lm_v = params["lm_head"].shape[0]
            else:                            # int8 (H, V)
                lm_v = params["lm_head_q"].shape[1]
            return params["lm_fold_w"], params["lm_fold_s"], True, lm_v
        return (
            params.get("lm_head", params.get("lm_head_q")),
            params.get("lm_head_s"), False, 0,
        )

    # Per-pallas_call launch overhead measured through the tunneled v5e
    # (NOTES.md); untunneled hardware is substantially cheaper. Override
    # with ASR_PALLAS_LAUNCH_US (measure with
    # scripts/measure_launch_overhead.py) or set the slab-size crossover
    # directly with ASR_DECODE_ATTN_THRESHOLD.
    TUNNEL_LAUNCH_OVERHEAD_US = 37.0
    _ATTN_THRESHOLD_AT_TUNNEL = 6144

    @classmethod
    def decode_attn_threshold(cls) -> int:
        """Slab size above which the DMA attention kernel beats dense XLA.

        The kernel only transfers LIVE cache blocks, so it saves
        HBM reads proportional to s_max but pays one pallas_call launch
        per layer. The crossover therefore scales linearly with the
        launch overhead; 6144 was measured at the ~37 us tunneled cost.
        """
        import os

        env = os.environ.get("ASR_DECODE_ATTN_THRESHOLD")
        if env:
            return int(env)
        launch_us = float(
            os.environ.get(
                "ASR_PALLAS_LAUNCH_US", cls.TUNNEL_LAUNCH_OVERHEAD_US
            )
        )
        return max(
            256,
            int(
                cls._ATTN_THRESHOLD_AT_TUNNEL
                * launch_us / cls.TUNNEL_LAUNCH_OVERHEAD_US
            ),
        )

    def _decode_attn_impl(self, s_max: int) -> str:
        """Choose the decode-attention implementation for a slab size.

        The fused Pallas kernel only transfers/processes LIVE cache blocks
        (dynamic trip count), so its cost scales with the live length
        while the XLA einsum path always reads the whole slab. The
        crossover (decode_attn_threshold) sits high on this platform
        because each pallas_call launch costs ~37 us through the tunnel
        (28 launches/step): measured at the 4096-token cap (s_max 4833)
        the two paths tie at ~3.0 ms/token, with the kernel winning
        beyond. ASR_DECODE_ATTN=dense|kernel overrides.
        """
        import os

        impl = os.environ.get("ASR_DECODE_ATTN", "auto")
        if impl == "auto":
            on_tpu = jax.default_backend() in ("tpu", "axon")
            return (
                "kernel"
                if (
                    on_tpu
                    and not self.prefer_xla
                    and s_max >= self.decode_attn_threshold()
                    # the DMA kernel's clamped block starts are computed
                    # in units of 8 (Mosaic alignment proof)
                    and s_max % 8 == 0
                )
                else "dense"
            )
        return impl

    def _decode_scan(self, params, hidden, cos, sin, cache, kv_start,
                     kv_end):
        """Scan the decode layers; returns (hidden, ks, vs) fresh K/V.

        kv_start: (B,) or None; kv_end: (B,) — live slab region per
        example (exclusive of the current token, which is handled as an
        explicit self-term).
        """
        impl = self._decode_attn_impl(cache.max_len)
        if cache.quantized and cache.max_len % 128:
            # int8-KV scale slabs are LANE-sliced in the DMA kernel, so
            # the clamp needs 128-aligned slabs (engine/serving allocate
            # 128-aligned when kv_quant; odd sizes fall back to dense)
            impl = "dense"
        num_layers = cache.k.shape[0]
        if impl == "kernel":
            from ..ops.pallas.decode_attention import decode_attention_dma

            k_slabs, v_slabs = cache.k, cache.v  # closed over: no slicing
            if cache.quantized:
                attn_fn = functools.partial(
                    decode_attention_dma,
                    k_scales=cache.k_scale, v_scales=cache.v_scale,
                )
            else:
                attn_fn = decode_attention_dma

            def step(h, layer, l_idx):
                return self._decode_layer_kernel(
                    layer, l_idx, h, cos, sin, k_slabs, v_slabs,
                    kv_start, kv_end, attn_fn,
                )
        else:
            s_max = cache.max_len
            live = jnp.arange(s_max)[None, :] < kv_end[:, None]
            if kv_start is not None:
                live = live & (
                    jnp.arange(s_max)[None, :] >= kv_start[:, None]
                )

            def step(h, layer, l_idx):
                k_lay = jax.lax.dynamic_index_in_dim(
                    cache.k, l_idx, keepdims=False
                )
                v_lay = jax.lax.dynamic_index_in_dim(
                    cache.v, l_idx, keepdims=False
                )
                if cache.quantized:
                    k_lay = dequantize_kv(
                        k_lay,
                        jax.lax.dynamic_index_in_dim(
                            cache.k_scale, l_idx, keepdims=False
                        ),
                        h.dtype,
                    )
                    v_lay = dequantize_kv(
                        v_lay,
                        jax.lax.dynamic_index_in_dim(
                            cache.v_scale, l_idx, keepdims=False
                        ),
                        h.dtype,
                    )
                return self._decode_layer_masked(
                    layer, h, cos, sin, k_lay, v_lay, live
                )

        if self.unroll_layers:
            # Unrolled python loop: weights and slab slices become static,
            # letting XLA schedule each layer's weight streaming
            # individually (slightly better decode overlap at ~5x the
            # compile time; opt-in via AsrEngine(unroll_decode=True)).
            h = hidden
            ks, vs = [], []
            for i in range(num_layers):
                layer = {k: v[i] for k, v in params["layers"].items()}
                h, k_f, v_f = step(h, layer, jnp.int32(i))
                ks.append(k_f)
                vs.append(v_f)
            return h, jnp.stack(ks), jnp.stack(vs)

        def body(h, xs):
            layer, l_idx = xs
            h, k_f, v_f = step(h, layer, l_idx)
            return h, (k_f, v_f)

        hidden, (ks, vs) = jax.lax.scan(
            body, hidden,
            (params["layers"], jnp.arange(num_layers, dtype=jnp.int32)),
        )
        return hidden, ks, vs

    def _decode_layer_kernel(self, layer, l_idx, h, cos, sin, k_slabs,
                             v_slabs, kv_start, kv_end, attn_fn):
        """Decode layer using the fused Pallas slab-attention kernel."""
        cfg = self.cfg
        b = h.shape[0]
        nq, nkv, hd = (
            cfg.num_attention_heads,
            cfg.num_key_value_heads,
            cfg.head_dim,
        )
        residual = h
        x = rms_norm(h, layer["input_ln_w"], cfg.rms_norm_eps)
        q, k, v = _qkv3(layer, x, nq, nkv, hd)
        q = rms_norm(q, layer["q_norm_w"], cfg.rms_norm_eps)
        k = rms_norm(k, layer["k_norm_w"], cfg.rms_norm_eps)
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)

        # self K/V stay UNQUANTIZED: the kernel folds the self token in
        # f32 regardless of the slab dtype (casting to an int8 slab's
        # dtype would truncate real values to garbage)
        self_dtype = (
            h.dtype if k_slabs.dtype == jnp.int8 else k_slabs.dtype
        )
        out = attn_fn(
            q[:, 0], k_slabs, v_slabs,
            k[:, 0].astype(self_dtype), v[:, 0].astype(self_dtype),
            l_idx, kv_start, kv_end,
            interpret=_interpret_pallas(),
        )  # (B, Hq, D)
        out = out.reshape(b, 1, nq * hd).astype(h.dtype)
        h = residual + _linear(layer, "o_w", out)
        residual = h
        x = rms_norm(h, layer["post_ln_w"], cfg.rms_norm_eps)
        h = residual + _linear(layer, "down_w", _gate_up(layer, x))
        return h, k[:, 0], v[:, 0]

    # ------------------------------------------------------------------ #
    # right-aligned batch layout: every example ENDS at slot P; example b
    # occupies slots [kv_start[b], P). All decode writes then share one
    # scalar slot (P + step) -> dynamic_update_slice instead of a batched
    # scatter that copies the slab.

    def prefill_aligned(
        self,
        params: PyTree,
        hidden,     # (B, P, hidden), right-aligned with left garbage
        kv_start,   # (B,) int32: first live slot per example
        cache: KVCache,
    ):
        """Right-aligned prefill. Returns (logits at slot P-1, cache)."""
        b, p, _ = hidden.shape
        slots = jnp.arange(p)
        positions = jnp.maximum(slots[None, :] - kv_start[:, None], 0)
        cos, sin = self.rotary.lookup_batch(positions)

        def body(h, xs):
            layer, k_c, v_c, ks_c, vs_c = xs
            h, kv = self._prefill_layer_aligned(
                layer, h, cos, sin, (k_c, v_c, ks_c, vs_c), kv_start
            )
            return h, kv

        hidden, (k, v, ks, vs) = jax.lax.scan(
            body, hidden,
            (params["layers"], cache.k, cache.v,
             cache.k_scale, cache.v_scale),
        )
        return (
            self.logits(params, hidden[:, -1:])[:, 0],
            KVCache(k=k, v=v, k_scale=ks, v_scale=vs),
        )

    def _prefill_layer_aligned(self, layer, x, cos, sin, kv, kv_start):
        cfg = self.cfg
        residual = x
        h = rms_norm(x, layer["input_ln_w"], cfg.rms_norm_eps)
        q, k, v = _qkv3(
            layer, h, cfg.num_attention_heads, cfg.num_key_value_heads,
            cfg.head_dim,
        )
        q = rms_norm(q, layer["q_norm_w"], cfg.rms_norm_eps)
        k = rms_norm(k, layer["k_norm_w"], cfg.rms_norm_eps)
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)
        kv = _store_kv(kv, k, v)
        attn = attention(q, k, v, causal=True, kv_start=kv_start)
        b, s, _, _ = attn.shape
        attn = attn.reshape(b, s, cfg.num_attention_heads * cfg.head_dim)
        x = residual + _linear(layer, "o_w", attn)
        residual = x
        h = rms_norm(x, layer["post_ln_w"], cfg.rms_norm_eps)
        h = _linear(layer, "down_w", _gate_up(layer, h))
        return residual + h, kv

    def decode_step_aligned(
        self,
        params: PyTree,
        token_ids,  # (B,) int32
        slot,       # SCALAR int32: this token's slot (shared, == P + step)
        kv_start,   # (B,) int32
        cache: KVCache,
    ):
        """Right-aligned decode step: shared write slot, per-example
        positions/masks. Returns (logits (B, V), cache)."""
        b = token_ids.shape[0]
        hidden = self.embed(params, token_ids)[:, None, :]
        positions = (slot - kv_start)[:, None]  # (B, 1)
        cos, sin = self.rotary.lookup_batch(positions)

        b_arr = jnp.broadcast_to(slot, (b,)).astype(jnp.int32)
        if nt := self._use_fused_step(params, b, slot, cache):
            from ..ops.pallas.decode_layer import decode_layers_fused

            h2, ks, vs = decode_layers_fused(
                hidden[:, 0], cos[:, 0], sin[:, 0], params["layers"],
                cache.k, cache.v, kv_start.astype(jnp.int32), b_arr,
                eps=self.cfg.rms_norm_eps,
                interpret=_interpret_pallas(),
                k_scales=cache.k_scale, v_scales=cache.v_scale,
                ffn_tiles=nt,
            )
            hidden = h2[:, None, :]
        else:
            hidden, ks, vs = self._decode_scan(
                params, hidden, cos, sin, cache,
                kv_start.astype(jnp.int32), b_arr,
            )
        cache = self._write_token_kv(cache, ks, vs, slot)
        return self.logits(params, hidden)[:, 0], cache

    def _decode_layer_masked(self, layer, h, cos, sin, k_lay, v_lay, live):
        """_decode_layer with an arbitrary (B, S) boolean slab mask."""
        cfg = self.cfg
        b = h.shape[0]
        nq, nkv, hd = (
            cfg.num_attention_heads,
            cfg.num_key_value_heads,
            cfg.head_dim,
        )
        groups = nq // nkv
        residual = h
        x = rms_norm(h, layer["input_ln_w"], cfg.rms_norm_eps)
        q, k, v = _qkv3(layer, x, nq, nkv, hd)
        q = rms_norm(q, layer["q_norm_w"], cfg.rms_norm_eps)
        k = rms_norm(k, layer["k_norm_w"], cfg.rms_norm_eps)
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)
        scale = hd ** -0.5
        qg = q.reshape(b, 1, nkv, groups, hd)
        sc = jnp.einsum(
            "bqhgd,bhkd->bhgqk", qg, k_lay,
            preferred_element_type=jnp.float32,
        ) * scale
        sc = jnp.where(live[:, None, None, None, :], sc, -1e9)
        s_self = jnp.einsum(
            "bqhgd,bqhd->bhgq", qg, k.astype(q.dtype),
            preferred_element_type=jnp.float32,
        )[..., None] * scale
        all_sc = jnp.concatenate([sc, s_self], -1)
        m = jnp.max(all_sc, -1, keepdims=True)
        p = jnp.exp(all_sc - m)
        p = p / jnp.sum(p, -1, keepdims=True)
        out = jnp.einsum(
            "bhgqk,bhkd->bqhgd", p[..., :-1].astype(v_lay.dtype), v_lay,
            preferred_element_type=jnp.float32,
        )
        out = out + jnp.einsum(
            "bhgq,bqhd->bqhgd", p[..., -1], v.astype(q.dtype),
            preferred_element_type=jnp.float32,
        )
        out = out.reshape(b, 1, nq * hd).astype(h.dtype)
        h = residual + _linear(layer, "o_w", out)
        residual = h
        x = rms_norm(h, layer["post_ln_w"], cfg.rms_norm_eps)
        h = residual + _linear(layer, "down_w", _gate_up(layer, x))
        return h, k[:, 0], v[:, 0]

    # ------------------------------------------------------------------ #

    def forward_full(self, params: PyTree, hidden, position_ids,
                     remat: bool = False):
        """Cache-free full forward returning all logits (training/tests).

        ``remat=True`` checkpoints each scanned layer (training memory:
        backward recomputes layers instead of saving activations).
        """
        b, s, _ = hidden.shape
        cos, sin = self.rotary.lookup(position_ids)
        cache = KVCache.zeros(self.cfg, b, s, dtype=hidden.dtype)
        hidden, _ = self._run_layers(
            params, hidden, cos, sin, cache, remat=remat
        )
        return self.logits(params, hidden)


# ---------------------------------------------------------------------- #
# Parameter init (synthetic weights for tests/benchmarks)
# ---------------------------------------------------------------------- #


def init_decoder_params(
    cfg: TextDecoderConfig,
    seed: int = 0,
    dtype=jnp.bfloat16,
    scale: float = 0.02,
) -> PyTree:
    rng = np.random.default_rng(seed)
    h, d = cfg.hidden_size, cfg.head_dim
    nq, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    inter, v, nl = cfg.intermediate_size, cfg.vocab_size, cfg.num_hidden_layers

    def w(*shape):
        return jnp.asarray(
            rng.standard_normal(shape, dtype=np.float32) * scale, dtype
        )

    def ones(*shape):
        return jnp.ones(shape, dtype)

    embed = w(v, h)
    params = {
        "embed": embed,
        "layers": {
            "input_ln_w": ones(nl, h),
            "q_w": w(nl, h, nq * d),
            "k_w": w(nl, h, nkv * d),
            "v_w": w(nl, h, nkv * d),
            "o_w": w(nl, nq * d, h),
            "q_norm_w": ones(nl, d),
            "k_norm_w": ones(nl, d),
            "post_ln_w": ones(nl, h),
            "gate_w": w(nl, h, inter),
            "up_w": w(nl, h, inter),
            "down_w": w(nl, inter, h),
        },
        "final_ln_w": ones(h),
        "lm_head": embed if cfg.tie_word_embeddings else w(v, h),
    }
    return params
