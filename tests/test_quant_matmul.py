"""Quantized matmul kernel parity + quantization error bounds."""

import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_rs_tpu.ops.pallas.quant_matmul import (
    dequantize,
    quant_matmul,
    quantize_weight,
)


@pytest.mark.parametrize(
    "r,k,n,bo,bi",
    [
        (8, 256, 512, 256, 128),
        (1, 1024, 2048, 512, 512),
        (8, 1024, 300, 512, 512),   # n not a block multiple
        (128, 512, 512, 256, 256),  # prefill-like row count
    ],
)
def test_quant_matmul_matches_dequant_reference(rng, r, k, n, bo, bi):
    # kernel computes in bf16 (int8 values are exact in bf16; the MXU
    # runs bf16 at full rate) with f32 accumulation — the reference is
    # the same math in plain jnp
    x = jnp.asarray(rng.standard_normal((r, k)) * 0.5, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.float32)
    w_q, s = quantize_weight(w)

    got = quant_matmul(x, w_q, s, block_out=bo, block_in=bi, interpret=True,
                       out_dtype=jnp.float32)
    wf = jnp.asarray(w_q, jnp.bfloat16).astype(jnp.float32)
    want = (x.astype(jnp.float32) @ wf) * s[None, :]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-3, rtol=5e-3
    )


def test_quantization_error_is_small(rng):
    w = jnp.asarray(rng.standard_normal((1024, 512)) * 0.02, jnp.float32)
    w_q, s = quantize_weight(w)
    err = np.abs(np.asarray(dequantize(w_q, s)) - np.asarray(w))
    # symmetric per-channel int8: max error is half a quant step
    step = np.asarray(s)[None, :]
    assert np.all(err <= step * 0.5 + 1e-8)
    rel = np.linalg.norm(err) / np.linalg.norm(np.asarray(w))
    # int8 per-channel RMS error for ~N(0, sigma) weights is
    # ~ (4 sigma / 127) / sqrt(12) / sigma ~ 0.9%
    assert rel < 2e-2


def test_quantize_weight_preserves_extremes():
    w = jnp.asarray([[1.0, -2.0], [-1.0, 2.0]], jnp.float32)
    w_q, s = quantize_weight(w)
    assert np.asarray(w_q).max() == 127
    np.testing.assert_allclose(
        np.asarray(dequantize(w_q, s)), np.asarray(w), atol=1e-6
    )


def test_quant_matvec_int4_tiled(rng):
    """Tile-local int4 pack + Pallas matvec == dequantized reference."""
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.ops.pallas.quant_matmul import (
        quant_matvec_int4,
        quantize_weight_int4_tiled,
    )

    K, N, TILE = 256, 1000, 512  # N not a multiple of the tile
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.float32)
    packed, scales = quantize_weight_int4_tiled(w, tile=TILE)
    assert packed.shape == (K, 512)  # 1000 -> 1024 padded, two per byte
    x = jnp.asarray(rng.standard_normal((3, K)) * 0.5, jnp.float32)
    y = quant_matvec_int4(x, packed, scales, tile=TILE, interpret=True)
    assert y.shape == (3, N)
    q = jnp.clip(jnp.round(w / scales[None, :]), -7, 7)
    want = np.asarray(x) @ (np.asarray(q) * np.asarray(scales)[None, :])
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-4, rtol=1e-4)


def test_int4_lm_head_logits_parity(rng):
    """bits=4 lm_head (Pallas matvec) ~= int8 lm_head logits, same argmax."""
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.config import tiny_test_config
    from qwen3_asr_rs_tpu.models.text_decoder import (
        TextDecoder, init_decoder_params,
    )
    from qwen3_asr_rs_tpu.weights.quantize import quantize_decoder_params

    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    dec = TextDecoder(cfg, max_position=64)
    ids = jnp.asarray([[3, 7, 1, 9, 2]], jnp.int32)
    h = dec.embed(params, ids)
    q4 = quantize_decoder_params(params, bits=4)
    assert "lm_head_q4" in q4
    q8 = quantize_decoder_params(params, bits=4, lm_bits=8)
    assert "lm_head_q" in q8
    got = np.asarray(dec.forward_full(q4, h, jnp.arange(5)))
    want = np.asarray(dec.forward_full(q8, h, jnp.arange(5)))
    assert got.shape == want.shape
    # int4 vs int8 lm quantization noise is bounded; argmax should agree
    # on synthetic weights with a wide logit spread
    assert np.abs(got - want).max() < 0.5
    assert (got.argmax(-1) == want.argmax(-1)).mean() == 1.0


def test_blocked_int4_pack_unpack_matches_plain(rng):
    """Blocked (per-tp-shard) packing dequantizes to exactly the same
    values as plain packing — only the nibble arrangement differs."""
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.ops.pallas.quant_matmul import (
        quantize_weight_int4,
        unpack_int4,
        unpack_int4_blocked,
    )

    w = rng.standard_normal((24, 64)).astype("float32")
    plain, s_plain = quantize_weight_int4(jnp.asarray(w))
    for blocks in (2, 4):
        blk, s_blk = quantize_weight_int4(jnp.asarray(w), blocks=blocks)
        assert blk.shape == (24, blocks, 64 // (2 * blocks))
        np.testing.assert_array_equal(
            np.asarray(s_blk), np.asarray(s_plain)
        )
        np.testing.assert_array_equal(
            np.asarray(unpack_int4_blocked(blk)),
            np.asarray(unpack_int4(plain)),
        )
        # shard-locality: each block's unpack reads only its own bytes
        one = np.asarray(unpack_int4_blocked(blk[:, 1:2]))
        full = np.asarray(unpack_int4_blocked(blk))
        np.testing.assert_array_equal(
            one, full[:, 64 // blocks : 2 * 64 // blocks]
        )


def test_quant_matmul_k_not_block_multiple(rng):
    """K % block_in != 0: the last k block's overhang must be masked
    (unmasked it dots unspecified memory -> NaN/garbage)."""
    x = jnp.asarray(rng.standard_normal((8, 300)), jnp.float32)
    w = rng.standard_normal((300, 512)).astype(np.float32) * 0.05
    w_q, s = quantize_weight(jnp.asarray(w))
    got = quant_matmul(x, w_q, s, block_in=256, interpret=True)
    want = x @ (w_q.astype(jnp.float32) * s[None, :])
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_quantize_weight_axis1(rng):
    """axis=1 (per-row scales) must broadcast along the row axis — the
    old [None, :] broadcast silently mis-scaled square matrices."""
    w = jnp.asarray(rng.standard_normal((64, 64)) * 0.1, jnp.float32)
    w_q, s = quantize_weight(w, axis=1)
    deq = w_q.astype(jnp.float32) * s[:, None]
    np.testing.assert_allclose(np.asarray(deq), np.asarray(w),
                               atol=np.abs(w).max() / 100)


def test_quant_matvec_int4_many_rows(rng):
    """R > 64 takes the XLA fallback (kernel VMEM can't hold the
    activations) and must match the small-R kernel path numerically."""
    from qwen3_asr_rs_tpu.ops.pallas.quant_matmul import (
        quant_matvec_int4, quantize_weight_int4_tiled,
    )

    k, n = 128, 1024
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    w_q4, s = quantize_weight_int4_tiled(jnp.asarray(w), tile=512)
    x_small = jnp.asarray(rng.standard_normal((4, k)), jnp.float32)
    x_big = jnp.concatenate([x_small] * 32, axis=0)  # 128 rows
    small = quant_matvec_int4(x_small, w_q4, s, tile=512, interpret=True)
    big = quant_matvec_int4(x_big, w_q4, s, tile=512, interpret=True)
    np.testing.assert_allclose(
        np.asarray(big[:4]), np.asarray(small), rtol=1e-5, atol=1e-5
    )
