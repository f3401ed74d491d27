"""Torch oracle: a from-spec reimplementation of the reference's math.

This mirrors what the reference computes through its tch backend (f32,
concat-grow KV cache, materialized masks, host-loop MRoPE) so the JAX
implementation can be cross-checked on random weights. It is test-only
code and intentionally written the reference's way, not the TPU way.

Spec sources: src/layers.rs (blocks), src/audio_encoder.rs (encoder),
src/text_decoder.rs (decoder), src/inference.rs (pipeline).
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def rms_norm(x, weight, eps):
    var = (x * x).mean(-1, keepdim=True)
    return x * torch.rsqrt(var + eps) * weight


def rotate_half(x):
    half = x.shape[-1] // 2
    return torch.cat([-x[..., half:], x[..., :half]], dim=-1)


def apply_rotary(x, cos, sin):
    # x: (B, H, S, D); cos/sin: (S, D)
    return x * cos[None, None] + rotate_half(x) * sin[None, None]


def mrope_cos_sin(position_ids, head_dim, rope_theta, sections, interleaved):
    """Host-loop MRoPE (src/layers.rs:471-522) in f64."""
    half = head_dim // 2
    seq = len(position_ids[0])
    inv_freq = [1.0 / rope_theta ** (2.0 * i / head_dim) for i in range(half)]
    # dim maps
    dim_map = []
    if interleaved:
        counts = [0] * len(sections)
        while len(dim_map) < half:
            prev = len(dim_map)
            for d in range(len(sections)):
                if len(dim_map) >= half:
                    break
                if counts[d] < sections[d]:
                    dim_map.append(d)
                    counts[d] += 1
            if len(dim_map) == prev:
                break
    else:
        for d, size in enumerate(sections):
            for _ in range(size):
                if len(dim_map) >= half:
                    break
                dim_map.append(d)
        while len(dim_map) < half:
            dim_map.append(len(sections) - 1)

    cos = np.zeros((seq, head_dim), dtype=np.float32)
    sin = np.zeros((seq, head_dim), dtype=np.float32)
    for tt in range(seq):
        for j in range(half):
            pos = float(position_ids[dim_map[j]][tt])
            ang = pos * inv_freq[j]
            cos[tt, j] = cos[tt, j + half] = math.cos(ang)
            sin[tt, j] = sin[tt, j + half] = math.sin(ang)
    return torch.from_numpy(cos), torch.from_numpy(sin)


def repeat_kv(x, n_rep):
    b, h, s, d = x.shape
    return (
        x[:, :, None].expand(b, h, n_rep, s, d).reshape(b, h * n_rep, s, d)
    )


class TorchTextDecoder:
    """Reference decoder math on a jax-format param pytree (f32 numpy)."""

    def __init__(self, cfg, params):
        self.cfg = cfg
        self.p = params

    def embed(self, ids):
        return t(self.p["embed"])[torch.as_tensor(ids)]

    def forward(self, hidden, cos, sin, kv_cache, mask):
        """hidden: (B, S, H) torch; kv_cache: list of (k, v) or None per layer."""
        cfg = self.cfg
        nq, nkv, hd = (
            cfg.num_attention_heads,
            cfg.num_key_value_heads,
            cfg.head_dim,
        )
        lp = self.p["layers"]
        for i in range(cfg.num_hidden_layers):
            residual = hidden
            h = rms_norm(hidden, t(lp["input_ln_w"][i]), cfg.rms_norm_eps)
            b, s, _ = h.shape
            q = (h @ t(lp["q_w"][i])).reshape(b, s, nq, hd).transpose(1, 2)
            k = (h @ t(lp["k_w"][i])).reshape(b, s, nkv, hd).transpose(1, 2)
            v = (h @ t(lp["v_w"][i])).reshape(b, s, nkv, hd).transpose(1, 2)
            q = rms_norm(q, t(lp["q_norm_w"][i]), cfg.rms_norm_eps)
            k = rms_norm(k, t(lp["k_norm_w"][i]), cfg.rms_norm_eps)
            q = apply_rotary(q, cos, sin)
            k = apply_rotary(k, cos, sin)
            if kv_cache[i] is not None:
                pk, pv = kv_cache[i]
                k = torch.cat([pk, k], dim=2)
                v = torch.cat([pv, v], dim=2)
            kv_cache[i] = (k, v)
            kr = repeat_kv(k, nq // nkv)
            vr = repeat_kv(v, nq // nkv)
            attn = q @ kr.transpose(-2, -1) / math.sqrt(hd)
            if mask is not None:
                attn = attn + mask
            attn = attn.softmax(-1)
            out = attn @ vr
            out = out.transpose(1, 2).reshape(b, s, nq * hd)
            hidden = residual + out @ t(lp["o_w"][i])

            residual = hidden
            h = rms_norm(hidden, t(lp["post_ln_w"][i]), cfg.rms_norm_eps)
            gate = F.silu(h @ t(lp["gate_w"][i]))
            up = h @ t(lp["up_w"][i])
            hidden = residual + (gate * up) @ t(lp["down_w"][i])

        hidden = rms_norm(hidden, t(self.p["final_ln_w"]), self.cfg.rms_norm_eps)
        return hidden @ t(self.p["lm_head"]).T


def causal_mask(seq_len, past_len):
    total = past_len + seq_len
    mask = torch.full((seq_len, total), float("-inf"))
    mask = torch.triu(mask, diagonal=past_len + 1)
    return mask[None, None]


class TorchAudioEncoder:
    """Reference encoder math (chunk, conv stem, windowed mask, layers)."""

    def __init__(self, cfg, params):
        self.cfg = cfg
        self.p = params

    def forward(self, mel):
        cfg = self.cfg
        p = self.p
        n_mels, frames = mel.shape
        cf = cfg.chunk_frames
        num_full = frames // cf
        tail = frames % cf
        chunks = []
        valid_counts = []
        for i in range(num_full):
            chunks.append(mel[:, i * cf : (i + 1) * cf])
            valid_counts.append(_feat_len(cf))
        if tail:
            pad = torch.zeros(n_mels, cf - tail)
            chunks.append(torch.cat([mel[:, num_full * cf :], pad], dim=1))
            valid_counts.append(_feat_len(tail))
        x = torch.stack(chunks)[:, None]  # (C, 1, mels, cf)

        for i in (1, 2, 3):
            x = F.conv2d(
                x, t(p[f"conv{i}_w"]), t(p[f"conv{i}_b"]), stride=2, padding=1
            )
            x = F.gelu(x)
        b, c, fr, tt = x.shape
        x = x.permute(0, 3, 1, 2).reshape(b, tt, c * fr)
        x = x @ t(p["conv_out_w"]) + t(p["conv_out_b"])

        pos = sinusoid_table(cfg.max_source_positions, cfg.d_model)[:tt]
        x = x + pos[None]

        hidden = torch.cat(
            [x[i, : valid_counts[i]] for i in range(len(valid_counts))], dim=0
        )[None]
        total = hidden.shape[1]

        mask = window_mask(total, valid_counts, cfg)
        lp = p["layers"]
        nh = cfg.encoder_attention_heads
        hd = cfg.d_model // nh
        for i in range(cfg.encoder_layers):
            residual = hidden
            h = F.layer_norm(
                hidden, (cfg.d_model,), t(lp["attn_ln_w"][i]),
                t(lp["attn_ln_b"][i]), eps=1e-5,
            )
            b2, s, _ = h.shape
            q = (h @ t(lp["q_w"][i]) + t(lp["q_b"][i])).reshape(b2, s, nh, hd)
            k = (h @ t(lp["k_w"][i]) + t(lp["k_b"][i])).reshape(b2, s, nh, hd)
            v = (h @ t(lp["v_w"][i]) + t(lp["v_b"][i])).reshape(b2, s, nh, hd)
            q, k, v = (z.permute(0, 2, 1, 3) for z in (q, k, v))
            attn = q @ k.transpose(-2, -1) / math.sqrt(hd)
            if mask is not None:
                attn = attn + mask
            attn = attn.softmax(-1)
            out = (attn @ v).permute(0, 2, 1, 3).reshape(b2, s, nh * hd)
            hidden = residual + out @ t(lp["out_w"][i]) + t(lp["out_b"][i])

            residual = hidden
            h = F.layer_norm(
                hidden, (cfg.d_model,), t(lp["ffn_ln_w"][i]),
                t(lp["ffn_ln_b"][i]), eps=1e-5,
            )
            h = F.gelu(h @ t(lp["fc1_w"][i]) + t(lp["fc1_b"][i]))
            hidden = residual + h @ t(lp["fc2_w"][i]) + t(lp["fc2_b"][i])

        hidden = F.layer_norm(
            hidden, (cfg.d_model,), t(p["ln_post_w"]), t(p["ln_post_b"]),
            eps=1e-5,
        )
        hidden = F.gelu(hidden @ t(p["proj1_w"]) + t(p["proj1_b"]))
        hidden = hidden @ t(p["proj2_w"]) + t(p["proj2_b"])
        return hidden[0]


def _feat_len(n):
    for _ in range(3):
        n = (n - 1) // 2 + 1
    return n


def sinusoid_table(max_len, dim):
    half = dim // 2
    inc = math.log(10000.0) / (half - 1)
    table = torch.zeros(max_len, dim)
    for pos in range(max_len):
        for i in range(half):
            ang = pos * math.exp(-i * inc)
            table[pos, i] = math.sin(ang)
            table[pos, half + i] = math.cos(ang)
    return table


def window_mask(total, valid_counts, cfg):
    """Block-diagonal -inf/0 mask (src/audio_encoder.rs:172-260)."""
    cpw = cfg.n_window_infer // cfg.chunk_frames
    if cpw == 0 or len(valid_counts) <= cpw:
        return None
    num_windows = -(-len(valid_counts) // cpw)
    allow = torch.zeros(total, total, dtype=torch.bool)
    off = 0
    for w in range(num_windows):
        cnt = sum(valid_counts[w * cpw : (w + 1) * cpw])
        allow[off : off + cnt, off : off + cnt] = True
        off += cnt
    return torch.where(
        allow, torch.zeros(total, total), torch.full((total, total), float("-inf"))
    )[None, None]
