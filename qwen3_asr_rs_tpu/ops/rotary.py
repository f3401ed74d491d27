"""MRoPE (multimodal rotary position embedding) — TPU-native.

The reference recomputes cos/sin on the host per forward call with a double
loop (src/layers.rs:471-522). Here the per-frequency angle tables are
precomputed once in float64 (matching the reference's f64 host math exactly)
and stored as device constants; position lookup is a pure gather inside the
jit graph, so the decode loop never touches the host.

MRoPE maps each rotary frequency index to one of three position rows
(temporal/height/width) through a section map, either contiguous
(src/layers.rs:524-538) or interleaved (src/layers.rs:540-562). For
Qwen3-ASR all three rows are identical (src/inference.rs:259-266), so this
degenerates to standard RoPE — but the general path is kept for config
fidelity.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def build_contiguous_dim_map(sections: Sequence[int], total: int) -> np.ndarray:
    """dim_map[j] = mrope row for frequency j; sections laid out contiguously."""
    out = []
    for dim, size in enumerate(sections):
        for _ in range(size):
            if len(out) >= total:
                break
            out.append(dim)
    while len(out) < total:
        out.append(len(sections) - 1)
    return np.asarray(out, dtype=np.int32)


def build_interleaved_dim_map(sections: Sequence[int], total: int) -> np.ndarray:
    """Round-robin over rows until each row's section quota is used up."""
    n_dims = len(sections)
    counts = [0] * n_dims
    out: list[int] = []
    while len(out) < total:
        prev = len(out)
        for dim in range(n_dims):
            if len(out) >= total:
                break
            if counts[dim] < sections[dim]:
                out.append(dim)
                counts[dim] += 1
        if len(out) == prev:
            break
    return np.asarray(out, dtype=np.int32)


class RotaryTable:
    """Precomputed rotary angle tables with MRoPE section lookup."""

    def __init__(
        self,
        head_dim: int,
        rope_theta: float = 1_000_000.0,
        mrope_section: Sequence[int] = (24, 20, 20),
        interleaved: bool = False,
        max_position: int = 8192,
    ):
        self.head_dim = head_dim
        self.half_dim = head_dim // 2
        self.max_position = max_position
        inv_freq = 1.0 / rope_theta ** (
            2.0 * np.arange(self.half_dim, dtype=np.float64) / head_dim
        )
        if interleaved:
            dim_map = build_interleaved_dim_map(mrope_section, self.half_dim)
        else:
            dim_map = build_contiguous_dim_map(mrope_section, self.half_dim)
        angles = np.arange(max_position, dtype=np.float64)[:, None] * inv_freq[None, :]
        self.cos_table = jnp.asarray(np.cos(angles).astype(np.float32))
        self.sin_table = jnp.asarray(np.sin(angles).astype(np.float32))
        self.dim_map = jnp.asarray(dim_map)
        self._uniform = bool(np.all(dim_map == dim_map[0]))

    def lookup_batch(self, position_ids):
        """Per-example positions: (B, S) int -> cos/sin (B, S, head_dim).

        Used by right-aligned batch layouts where each example's position
        for a given slot differs (pos = slot - left_pad). Takes a single
        position row per example, i.e. the caller asserts all MRoPE rows
        are identical (true for ASR, src/inference.rs:259-266) — then the
        dim map is irrelevant and a plain row gather is exact.
        """
        position_ids = jnp.asarray(position_ids)
        cos_half = self.cos_table[position_ids]  # (B, S, half)
        sin_half = self.sin_table[position_ids]
        cos = jnp.concatenate([cos_half, cos_half], axis=-1)
        sin = jnp.concatenate([sin_half, sin_half], axis=-1)
        return cos, sin

    def lookup(self, position_ids):
        """cos/sin for 3-row (or 1-row) position ids.

        Args:
          position_ids: int array, shape ``(3, seq)`` (MRoPE rows) or
            ``(seq,)`` (identical rows — the ASR case).

        Returns:
          ``(cos, sin)`` each of shape ``(seq, head_dim)`` float32, with the
          standard RoPE half-duplication (first half == second half).
        """
        position_ids = jnp.asarray(position_ids)
        if position_ids.ndim == 1:
            pos = position_ids[:, None]  # (seq, 1) broadcasts over freqs
            cos_half = self.cos_table[pos, jnp.arange(self.half_dim)[None, :]]
            sin_half = self.sin_table[pos, jnp.arange(self.half_dim)[None, :]]
        else:
            # per-frequency row select: pos[t, j] = position_ids[dim_map[j], t]
            pos = position_ids[self.dim_map, :].T  # (seq, half_dim)
            j = jnp.arange(self.half_dim)[None, :]
            cos_half = self.cos_table[pos, j]
            sin_half = self.sin_table[pos, j]
        cos = jnp.concatenate([cos_half, cos_half], axis=-1)
        sin = jnp.concatenate([sin_half, sin_half], axis=-1)
        return cos, sin


def apply_rotary(x, cos, sin):
    """Rotate ``x`` of shape (B, S, H, D) by cos/sin.

    cos/sin may be (S, D) (shared across batch) or (B, S, D) (per-example
    positions, used by batched decode).

    Matches reference rotate_half convention (src/layers.rs:361-375):
    out = x * cos + [-x2, x1] * sin. Computed in f32, cast back to x.dtype.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    x1 = xf[..., :half]
    x2 = xf[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    if cos.ndim == 2:
        c = cos[None, :, None, :]
        s = sin[None, :, None, :]
    else:
        c = cos[:, :, None, :]
        s = sin[:, :, None, :]
    return (xf * c + rotated * s).astype(dtype)
