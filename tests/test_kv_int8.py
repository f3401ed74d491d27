"""int8 KV slab: quantize-on-write / dequantize-at-attention parity.

The int8 cache stores per-(layer, batch, head, slot) symmetric scales;
logits drift only by KV-quantization noise, and the megakernel and scan
paths agree (almost) exactly on the SAME quantized cache.
"""

import jax.numpy as jnp
import numpy as np

from qwen3_asr_rs_tpu.config import tiny_test_config
from qwen3_asr_rs_tpu.models.text_decoder import (
    KVCache,
    TextDecoder,
    init_decoder_params,
    dequantize_kv,
    quantize_kv,
)
import pytest

pytestmark = pytest.mark.slow  # heavy parity/e2e: quick tier skips


def test_quantize_kv_roundtrip(rng):
    t = jnp.asarray(rng.standard_normal((3, 4, 7, 16)) * 2.0, jnp.float32)
    q, s = quantize_kv(t)
    assert q.dtype == jnp.int8 and s.shape == (3, 4, 7)
    back = dequantize_kv(q, s, jnp.float32)
    # symmetric int8: max error is scale/2 = absmax/254 per slot
    err = np.abs(np.asarray(back - t))
    bound = np.asarray(s)[..., None] / 2 + 1e-6
    assert (err <= bound).all()


def test_int8_kv_decode_close_to_bf16(rng):
    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    dec = TextDecoder(cfg, max_position=64)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6)), jnp.int32)
    h = dec.embed(params, ids)

    c0 = KVCache.zeros(cfg, 2, 24, dtype=jnp.float32)
    cq = KVCache.zeros(cfg, 2, 24, quantized=True)
    assert cq.quantized and not c0.quantized
    l0, c0 = dec.prefill(params, h, jnp.arange(6), c0, jnp.int32(6))
    lq, cq = dec.prefill(params, h, jnp.arange(6), cq, jnp.int32(6))
    # prefill attends over the FRESH (unquantized) keys: identical
    np.testing.assert_allclose(np.asarray(l0), np.asarray(lq), atol=1e-6)

    tok = jnp.asarray([3, 5], jnp.int32)
    for step in range(3):
        l0, c0 = dec.decode_step(params, tok, jnp.int32(6 + step), c0)
        lq, cq = dec.decode_step(params, tok, jnp.int32(6 + step), cq)
        # KV-quantization noise only
        np.testing.assert_allclose(
            np.asarray(l0), np.asarray(lq), atol=0.05, rtol=0.05
        )

    # per-example positions exercise the scatter write incl. scales
    posv = jnp.asarray([9, 9], jnp.int32)
    _, cqv = dec.decode_step(params, tok, posv, cq)
    assert bool(jnp.all(jnp.isfinite(cqv.k_scale)))


def test_int8_kv_megakernel_matches_scan(rng, monkeypatch):
    """Fused decode megakernel == scan path on the same int8 cache."""
    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    dec = TextDecoder(cfg, max_position=64)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 6)), jnp.int32)
    h = dec.embed(params, ids)
    cq = KVCache.zeros(cfg, 1, 24, quantized=True)
    _, cq = dec.prefill(params, h, jnp.arange(6), cq, jnp.int32(6))
    tok = jnp.asarray([3], jnp.int32)

    monkeypatch.setenv("ASR_DECODE_IMPL", "fused")
    lf, cf = dec.decode_step(params, tok, jnp.int32(6), cq)
    monkeypatch.setenv("ASR_DECODE_IMPL", "scan")
    ls, cs = dec.decode_step(params, tok, jnp.int32(6), cq)
    np.testing.assert_allclose(
        np.asarray(lf), np.asarray(ls), atol=2e-4, rtol=1e-4
    )
    # identical quantized slab contents after the write
    np.testing.assert_array_equal(np.asarray(cf.k), np.asarray(cs.k))
    np.testing.assert_allclose(
        np.asarray(cf.k_scale), np.asarray(cs.k_scale), atol=1e-6
    )


def test_engine_with_int8_kv(rng):
    """e2e: AsrEngine(kv_dtype='int8') transcribes and grows the slab."""
    import sys

    sys.path.insert(0, "tests")
    from test_engine_e2e import MockTokenizer, make_engine

    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine

    _, cfg, enc_params, dec_params = make_engine(max_new=4)
    eng = AsrEngine(
        model_dir=None, dtype=jnp.float32, max_new_tokens=4,
        chunk_buckets=(2, 4), config=cfg,
        params=(enc_params, dec_params), tokenizer=MockTokenizer(),
        kv_dtype="int8",
    )
    samples = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    out = eng.transcribe_samples(samples)
    assert isinstance(out.text, str)


def test_engine_int8_kv_dma_kernel_matches_dense(rng, monkeypatch):
    """int8-KV decode through the live-block DMA kernel (round 5: the
    kernel grew an int8 path; before, int8 KV forced whole-slab dense
    reads) must emit the same tokens as the dense XLA dequant path."""
    import sys

    sys.path.insert(0, "tests")
    from test_engine_e2e import MockTokenizer, make_engine

    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine

    _, cfg, enc_params, dec_params = make_engine(max_new=6)

    def eng():
        return AsrEngine(
            model_dir=None, dtype=jnp.float32, max_new_tokens=6,
            chunk_buckets=(2,), config=cfg,
            params=(enc_params, dec_params), tokenizer=MockTokenizer(),
            kv_dtype="int8",
        )

    samples = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    monkeypatch.setenv("ASR_DECODE_ATTN", "dense")
    dense = eng().transcribe_samples(samples)
    monkeypatch.setenv("ASR_DECODE_ATTN", "kernel")
    kernel = eng().transcribe_samples(samples)
    assert kernel.raw_output == dense.raw_output
