"""Stochastic decoding: temperature / top-k / top-p (nucleus) sampling.

The reference is greedy-only — its decode loop takes argmax every step
(src/inference.rs:160-200) — so this is a capability extension, not a
parity item. It exists for the serving surface: the OpenAI transcription
API this server is compatible with exposes a ``temperature`` parameter,
and Whisper-style deployments raise it to break repetition loops on
hard audio.

Everything here is shape-static and jit-safe: ``sample_token`` runs
INSIDE the on-device decode ``while_loop``/``fori_loop``, so a sampled
decode still costs one host sync per utterance (or per serving segment),
exactly like the greedy path.

Design notes (TPU):
  * ``top_k`` and ``top_p`` are STATIC (Python) values by default: a
    disabled filter must compile to nothing — a nucleus filter is a
    full-vocab sort (V = 151,936) per step, which should only be in the
    graph when requested. Distinct values compile distinct graphs
    (deployments pin them once). ``top_p`` may ALSO be traced (scalar
    or per-row vector): serving's nucleus segment variant holds a
    per-slot top_p vector in device state so requests with different
    nucleus masses share one graph; the sort is then unconditionally in
    that variant, which only compiles when a nucleus request is live.
  * ``temperature`` is TRACED (scalar or per-row vector), so serving can
    hold a per-slot temperature vector in device state and mixed
    greedy/sampled requests share one segment graph: rows with
    temperature <= 0 take the argmax inside the same program.
  * One PRNG key per step is enough for a whole batch:
    ``jax.random.categorical`` draws Gumbel noise of the full
    ``logits.shape``, so rows are independent. Across dp *shard_map*
    shards the caller must fold in the shard index (the engine does) —
    the same key on every shard would give shard-local row i identical
    noise.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Decoding hyper-parameters for one transcription call.

    ``temperature <= 0`` means pure greedy (the default — identical
    graphs and tokens to not passing params at all). ``top_k = 0`` and
    ``top_p >= 1`` disable those filters.
    """

    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    seed: int = 0

    @property
    def greedy(self) -> bool:
        return self.temperature <= 0.0

    def validate(self) -> "SamplingParams":
        if self.top_k < 0:
            raise ValueError(f"top_k must be >= 0, got {self.top_k}")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError(
                f"top_p must be in (0, 1], got {self.top_p}"
            )
        if self.temperature < 0.0:
            raise ValueError(
                f"temperature must be >= 0, got {self.temperature}"
            )
        return self


def apply_top_k(logits, top_k: int):
    """Keep the ``top_k`` largest logits per row, -inf the rest.

    ``top_k`` is static; 0 (or >= vocab) is the identity.
    """
    if top_k <= 0 or top_k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def apply_top_p(logits, top_p):
    """Nucleus filter: keep the smallest prefix of the descending-prob
    distribution whose mass reaches ``top_p``; -inf the rest.

    The highest-probability token is always kept (``cum - p < top_p``
    is strict-before semantics), so the filter can never empty a row.

    ``top_p`` may be a STATIC float — >= 1 is the identity and compiles
    to nothing, so the full-vocab sort only exists in nucleus graphs —
    or a TRACED scalar / per-row (B,) vector, which serving uses to give
    each slot its own nucleus mass inside ONE compiled segment variant
    (rows at 1.0 keep every token: the strict-before test is true for
    the whole row, so greedy/temperature-only rows are untouched).
    """
    if isinstance(top_p, (int, float)):
        if top_p >= 1.0:
            return logits
        pcol = top_p
    else:
        p = jnp.asarray(top_p, jnp.float32)
        pcol = p[..., None] if p.ndim else p
    desc = -jnp.sort(-logits, axis=-1)  # descending
    probs = jax.nn.softmax(desc, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = (cum - probs) < pcol  # keep while mass BEFORE token < p
    thresh = jnp.min(
        jnp.where(keep, desc, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits < thresh, -jnp.inf, logits)


def sample_token(
    logits,
    key,
    temperature,
    top_k: int = 0,
    top_p=1.0,
):
    """One decode-step sample: (B, V) or (V,) f32-ish logits -> int32 ids.

    ``temperature`` may be a traced scalar or a per-row (B,) vector;
    rows with temperature <= 0 take the argmax (exact greedy parity
    inside the same compiled graph). ``top_k`` is static; ``top_p`` may
    be static OR a traced scalar / per-row vector (see apply_top_p).
    Returns ids with the logits' leading shape.
    """
    logits = logits.astype(jnp.float32)
    temp = jnp.asarray(temperature, jnp.float32)
    tcol = temp[..., None] if temp.ndim else temp
    scaled = logits / jnp.maximum(tcol, 1e-6)
    scaled = apply_top_k(scaled, top_k)
    scaled = apply_top_p(scaled, top_p)
    sampled = jax.random.categorical(key, scaled, axis=-1)
    greedy = jnp.argmax(logits, axis=-1)
    return jnp.where(temp > 0, sampled, greedy).astype(jnp.int32)


def filtered_probs(logits, temperature, top_k: int = 0, top_p=1.0):
    """The EXACT distribution ``sample_token`` draws from, as
    probabilities: softmax(top_p(top_k(logits / T))).

    Speculative sampling needs both the draft's and the target's full
    distributions (not just a draw) for the accept/residual step; any
    mismatch with sample_token's filtering would silently bias the
    output distribution, so both call the same filter chain.
    """
    logits = logits.astype(jnp.float32)
    temp = jnp.asarray(temperature, jnp.float32)
    tcol = temp[..., None] if temp.ndim else temp
    scaled = logits / jnp.maximum(tcol, 1e-6)
    scaled = apply_top_k(scaled, top_k)
    scaled = apply_top_p(scaled, top_p)
    return jax.nn.softmax(scaled, axis=-1)


def speculative_accept(key, drafts, q_probs, p_probs):
    """Rejection step of speculative SAMPLING (Leviathan/Chen et al.).

    ``drafts``: (k,) int32 proposals d_1..d_k drawn from the draft
    distributions ``q_probs`` (k, V); ``p_probs`` (k+1, V) are the
    target distributions at the same positions plus the bonus position.

    Each d_i is accepted with probability min(1, p_i(d_i) / q_i(d_i));
    at the first rejection r the replacement token is drawn from the
    residual norm(max(p_r - q_r, 0)), and when all k are accepted the
    bonus token is drawn from p_{k+1}. Returns (acc, next_token): the
    emitted sequence d_1..d_acc, next_token is distributed EXACTLY as
    sequential sampling from the target (the standard speculative-
    sampling theorem) — the draft only changes speed, never the
    distribution. Pinned empirically in tests/test_sampling.py.
    """
    k = drafts.shape[0]
    u = jax.random.uniform(jax.random.fold_in(key, 0), (k,))
    pi = p_probs[jnp.arange(k), drafts]
    qi = q_probs[jnp.arange(k), drafts]
    ok = u * jnp.maximum(qi, 1e-30) < pi  # u < min(1, p/q), sort-free
    acc = jnp.sum(jnp.cumprod(ok.astype(jnp.int32)))
    p_acc = p_probs[acc]  # (V,) — gather at the traced index
    q_acc = jnp.where(
        acc < k,
        q_probs[jnp.minimum(acc, k - 1)],
        jnp.zeros_like(p_acc),  # all accepted: bonus draw from p_k
    )
    res = jnp.maximum(p_acc - q_acc, 0.0)
    total = jnp.sum(res)
    # fp guard: at a true rejection the residual has positive mass by
    # construction; if rounding kills it, fall back to the target dist
    probs = jnp.where(total > 1e-12, res / jnp.maximum(total, 1e-30),
                      p_acc)
    next_token = jax.random.categorical(
        jax.random.fold_in(key, 1), jnp.log(jnp.maximum(probs, 1e-30))
    )
    return acc, next_token.astype(jnp.int32)


def normalize(params: Optional[SamplingParams]) -> SamplingParams:
    """None -> greedy params; otherwise validated as-is."""
    if params is None:
        return SamplingParams()
    return params.validate()
