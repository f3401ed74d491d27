"""Dense attention ops (XLA path).

These are the reference-fidelity implementations; the Pallas kernels in
``ops/pallas/`` are drop-in replacements for the hot paths and are verified
against these.

Design notes (TPU-first, deliberately different from the reference):
  * activations live in (batch, seq, heads, head_dim) layout; einsum
    contractions put the MXU on the (seq x seq) and (seq x head_dim)
    matmuls without explicit transposes.
  * GQA never materializes repeated K/V (the reference repeat-expands,
    src/layers.rs:350-358); the query heads are grouped
    (B, S, H_kv, G, D) and the contraction broadcasts over the group.
  * masks are additive with a large-negative finite constant instead of
    -inf so fully-masked (padding) rows stay NaN-free.
  * softmax in float32 regardless of compute dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Large negative additive-mask value. exp(x - max) underflows to exactly 0
# for any real max, so results match a -inf mask without NaN rows.
MASK_VALUE = -1e9


def auto_attention_impl(b: int, hq: int, sq: int, sk: int,
                        on_tpu: bool) -> str:
    """'flash' or 'dense' for the auto dispatch.

    Measured on v5e (0.6B decoder prefill, B=1, 16Q/8KV, D=128,
    bf16). After the round-5 kernel tuning (bf16 in-kernel QK dot,
    256x512 blocks — scripts/perf_flash_tune.py, PERFORMANCE.md round
    5), flash is ~parity with dense at 4k tokens and WINS 1.07-1.14x
    at 6k-9k (dense/flash ms: 4096: 106/111, 6144: 177/154, 9216:
    282/264), on top of its memory advantage: dense materializes the
    (B, Hq, Sq, Sk) f32 scores (5 GB at 9k tokens), flash streams
    them through VMEM. Below 4k dense still wins slightly (2048:
    46.8/51) thanks to XLA fusion, so the dispatch is sized in score
    BYTES (B*Hq*Sq*Sk*4), not sequence length alone: a batch-8
    prefill at 3k tokens materializes the same bytes a batch-1
    9k-token prefill does and flips to flash at the same point.
    ASR_ATTN_THRESHOLD is the B=1-equivalent sequence length
    (default 4096).
    """
    import os

    threshold = int(os.environ.get("ASR_ATTN_THRESHOLD", "4096"))
    score_bytes = b * hq * sq * sk * 4
    limit_bytes = hq * threshold * threshold * 4
    return "flash" if (on_tpu and score_bytes >= limit_bytes) else "dense"


def dense_attention(q, k, v, *, mask=None, scale: float | None = None):
    """Multi-head (optionally grouped-query) scaled dot-product attention.

    Args:
      q: (B, Sq, Hq, D)
      k, v: (B, Sk, Hkv, D); Hq must be a multiple of Hkv.
      mask: optional additive mask broadcastable to (B, H, Sq, Sk), or a
        boolean mask of the same broadcast shape (True = attend).
      scale: defaults to 1/sqrt(D) (reference divides by sqrt(head_dim),
        src/layers.rs:161-162, :327-328).

    Returns:
      (B, Sq, Hq, D) in q.dtype.
    """
    b, sq, hq, d = q.shape
    _, sk, hkv, _ = k.shape
    groups = hq // hkv
    if scale is None:
        scale = d ** -0.5

    qg = q.reshape(b, sq, hkv, groups, d)
    # scores: (B, Hkv, G, Sq, Sk)
    scores = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32
    )
    scores = scores.astype(jnp.float32) * scale

    if mask is not None:
        if mask.dtype == jnp.bool_:
            mask = jnp.where(mask, 0.0, MASK_VALUE).astype(jnp.float32)
        # broadcast (., H, Sq, Sk) onto the grouped (B, Hkv, G, Sq, Sk)
        if mask.ndim == 4 and mask.shape[1] not in (1, hkv):
            mask = mask.reshape(mask.shape[0], hkv, groups, *mask.shape[2:])
        elif mask.ndim == 4:
            mask = mask[:, :, None]
        scores = scores + mask

    probs = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, sq, hq, d).astype(q.dtype)


def attention(
    q,
    k,
    v,
    *,
    causal: bool = False,
    kv_valid=None,
    kv_start=None,
    scale: float | None = None,
    impl: str | None = None,
):
    """Structured-mask attention with implementation dispatch.

    Args:
      q: (B, Sq, Hq, D); k, v: (B, Sk, Hkv, D).
      causal: query i attends keys j <= i (prefill).
      kv_valid: optional (B,) int32 — keys with index >= kv_valid[b] are
        masked (encoder window padding / decode slot limit).
      kv_start: optional (B,) int32 — keys with index < kv_start[b] are
        masked (left-padded/right-aligned batch layouts).
      impl: 'dense' | 'flash' | None (auto). Auto uses the Pallas flash
        kernel on TPU for long sequences (where the materialized score
        matrix would be HBM-resident) and the fused-by-XLA dense path
        otherwise. Env var ASR_ATTN_IMPL overrides.

    Both implementations produce identical numerics (tested).
    """
    import os

    if impl is None:
        impl = os.environ.get("ASR_ATTN_IMPL", "auto")
    if impl == "auto":
        impl = auto_attention_impl(
            b=q.shape[0], hq=q.shape[2], sq=q.shape[1], sk=k.shape[1],
            on_tpu=jax.default_backend() in ("tpu", "axon"),
        )

    if impl == "flash":
        from .pallas.flash_attention import flash_attention

        return flash_attention(
            q, k, v, kv_valid, kv_start, causal=causal, scale=scale,
            interpret=jax.default_backend() not in ("tpu", "axon"),
        )

    mask = None
    sq, sk = q.shape[1], k.shape[1]
    if kv_valid is not None:
        j = jnp.arange(sk)[None, None, None, :]
        mask = jnp.where(j < kv_valid[:, None, None, None], 0.0, MASK_VALUE)
    if kv_start is not None:
        j = jnp.arange(sk)[None, None, None, :]
        sm = jnp.where(j >= kv_start[:, None, None, None], 0.0, MASK_VALUE)
        mask = sm if mask is None else mask + sm
    if causal:
        i = jnp.arange(sq)[:, None]
        j = jnp.arange(sk)[None, :]
        cm = jnp.where(j <= i, 0.0, MASK_VALUE)[None, None]
        mask = cm if mask is None else mask + cm
    return dense_attention(q, k, v, mask=mask, scale=scale)


def causal_mask(seq_len: int, dtype=jnp.float32):
    """Additive causal mask of shape (1, 1, seq, seq)."""
    i = jnp.arange(seq_len)[:, None]
    j = jnp.arange(seq_len)[None, :]
    m = jnp.where(j <= i, 0.0, MASK_VALUE).astype(dtype)
    return m[None, None]


def length_mask(lengths, max_len: int):
    """Boolean key-validity mask (B, 1, 1, max_len) from per-example lengths."""
    j = jnp.arange(max_len)[None, :]
    return (j < lengths[:, None])[:, None, None, :]
