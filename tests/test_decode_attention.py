"""Fused decode-attention kernel parity vs an explicit dense reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_rs_tpu.ops.pallas.decode_attention import (
    decode_attention,
    decode_attention_dma,
)


def dense_reference(q, k_slab, v_slab, k_self, v_self, start, end):
    # slabs are (B, Hkv, S, D)
    b, hq, d = q.shape
    _, hkv, s, _ = k_slab.shape
    g = hq // hkv
    out = np.zeros((b, hq, d), np.float32)
    scale = d ** -0.5
    for bb in range(b):
        lo = 0 if start is None else int(start[bb])
        hi = int(end[bb])
        for h in range(hq):
            kvh = h // g
            keys = np.concatenate(
                [k_slab[bb, kvh, lo:hi], k_self[bb, kvh][None]], 0
            )
            vals = np.concatenate(
                [v_slab[bb, kvh, lo:hi], v_self[bb, kvh][None]], 0
            )
            sc = keys @ q[bb, h] * scale
            p = np.exp(sc - sc.max())
            p /= p.sum()
            out[bb, h] = p @ vals
    return out


@pytest.mark.parametrize(
    "b,s,hq,hkv,d,starts,ends,block_s",
    [
        # slab sizes are 8-aligned (the DMA kernel's contract — engine
        # and serving allocate 8-aligned slabs) but deliberately NOT
        # block multiples, so the clamped-last-block path is exercised
        (1, 584, 16, 8, 128, None, [450], 256),
        (2, 304, 16, 8, 128, [0, 37], [296, 120], 128),
        (1, 64, 4, 2, 64, None, [64], 64),
        (3, 136, 8, 4, 128, [5, 0, 60], [100, 136, 61], 64),  # ragged block
    ],
)
@pytest.mark.slow
def test_decode_attention_matches_dense(rng, b, s, hq, hkv, d, starts,
                                        ends, block_s):
    q = (rng.standard_normal((b, hq, d)) * 0.5).astype(np.float32)
    k_slab = (rng.standard_normal((b, hkv, s, d)) * 0.3).astype(np.float32)
    v_slab = (rng.standard_normal((b, hkv, s, d)) * 0.3).astype(np.float32)
    k_self = (rng.standard_normal((b, hkv, d)) * 0.3).astype(np.float32)
    v_self = (rng.standard_normal((b, hkv, d)) * 0.3).astype(np.float32)
    start = None if starts is None else jnp.asarray(starts, jnp.int32)
    end = jnp.asarray(ends, jnp.int32)

    got = decode_attention(
        jnp.asarray(q), jnp.asarray(k_slab), jnp.asarray(v_slab),
        jnp.asarray(k_self), jnp.asarray(v_self), start, end,
        block_s=block_s, interpret=True,
    )
    want = dense_reference(q, k_slab, v_slab, k_self, v_self,
                           None if starts is None else starts, ends)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-2, rtol=3e-2)

    # manual-DMA variant (dynamic live-block trip count), with a stacked
    # 3-layer slab read at layer index 1
    k3 = np.stack([k_slab * 0.5, k_slab, k_slab * 2.0])
    v3 = np.stack([v_slab * 0.5, v_slab, v_slab * 2.0])
    got_dma = decode_attention_dma(
        jnp.asarray(q), jnp.asarray(k3), jnp.asarray(v3),
        jnp.asarray(k_self), jnp.asarray(v_self), jnp.int32(1),
        start, end, block_s=block_s, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_dma), want, atol=3e-2,
                               rtol=3e-2)


@pytest.mark.parametrize(
    "b,s,starts,ends,block_s",
    [
        # int8-KV slabs must be 128-aligned (scale slabs lane-slice);
        # ends mid-block exercise the clamp + mask path
        (1, 640, None, [450], 256),
        (2, 384, [0, 137], [296, 250], 128),
        (1, 128, [0], [1], 128),  # single live slot
    ],
)
@pytest.mark.slow
def test_decode_attention_dma_int8_kv(rng, b, s, starts, ends, block_s):
    """int8-KV DMA path: per-slot dequant inside the kernel must match
    the dense reference on the dequantized values."""
    from qwen3_asr_rs_tpu.models.text_decoder import quantize_kv

    hq, hkv, d = 16, 8, 128
    L = 3
    q = (rng.standard_normal((b, hq, d)) * 0.5).astype(np.float32)
    k3 = (rng.standard_normal((L, b, hkv, s, d)) * 0.3).astype(np.float32)
    v3 = (rng.standard_normal((L, b, hkv, s, d)) * 0.3).astype(np.float32)
    k_self = (rng.standard_normal((b, hkv, d)) * 0.3).astype(np.float32)
    v_self = (rng.standard_normal((b, hkv, d)) * 0.3).astype(np.float32)

    kq, ks = quantize_kv(jnp.asarray(k3))
    vq, vs = quantize_kv(jnp.asarray(v3))
    start = None if starts is None else jnp.asarray(starts, jnp.int32)
    end = jnp.asarray(ends, jnp.int32)

    got = decode_attention_dma(
        jnp.asarray(q), kq, vq,
        jnp.asarray(k_self), jnp.asarray(v_self), jnp.int32(1),
        start, end,
        k_scales=ks, v_scales=vs,
        block_s=block_s, interpret=True,
    )
    # reference attends the DEQUANTIZED slab values
    k_deq = np.asarray(kq[1], np.float32) * np.asarray(ks[1])[..., None]
    v_deq = np.asarray(vq[1], np.float32) * np.asarray(vs[1])[..., None]
    want = dense_reference(
        q, k_deq, v_deq, k_self, v_self,
        None if starts is None else starts, ends,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-2, rtol=3e-2)


@pytest.mark.slow
def test_decode_attention_dma_int8_alignment_contract():
    """int8-KV slabs that are 8- but not 128-aligned must be rejected
    (the scale-slab lane slice cannot be proven aligned)."""
    b, hq, hkv, d, s = 1, 4, 2, 128, 136  # 136 % 8 == 0, % 128 != 0
    z = jnp.zeros
    with pytest.raises(ValueError, match="128-aligned"):
        decode_attention_dma(
            z((b, hq, d)), z((1, b, hkv, s, d), jnp.int8),
            z((1, b, hkv, s, d), jnp.int8),
            z((b, hkv, d)), z((b, hkv, d)), jnp.int32(0),
            None, jnp.asarray([8], jnp.int32),
            k_scales=z((1, b, hkv, s)), v_scales=z((1, b, hkv, s)),
            interpret=True,
        )
