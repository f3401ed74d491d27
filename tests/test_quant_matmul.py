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
