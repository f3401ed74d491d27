"""Decode megakernel parity: fused single-kernel step == scan-path step."""

import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_rs_tpu.config import tiny_test_config
from qwen3_asr_rs_tpu.models.text_decoder import (
    KVCache,
    TextDecoder,
    init_decoder_params,
)

pytestmark = pytest.mark.slow  # heavy parity/e2e: quick tier skips


@pytest.mark.parametrize("s_max,pos", [(64, 37), (130, 100), (32, 1)])
def test_fused_decode_step_matches_scan(rng, monkeypatch, s_max, pos):
    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    dec = TextDecoder(cfg, max_position=256)

    cache = KVCache.zeros(cfg, 1, s_max, dtype=jnp.float32)
    cache = KVCache(
        k=jnp.asarray(rng.standard_normal(cache.k.shape) * 0.1, jnp.float32),
        v=jnp.asarray(rng.standard_normal(cache.v.shape) * 0.1, jnp.float32),
    )
    tok = jnp.asarray([42], jnp.int32)

    monkeypatch.setenv("ASR_DECODE_IMPL", "scan")
    logits_scan, cache_scan = dec.decode_step(
        params, tok, jnp.int32(pos), cache
    )

    monkeypatch.setenv("ASR_DECODE_IMPL", "fused")
    logits_fused, cache_fused = dec.decode_step(
        params, tok, jnp.int32(pos), cache
    )

    np.testing.assert_allclose(
        np.asarray(logits_fused), np.asarray(logits_scan),
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(cache_fused.k), np.asarray(cache_scan.k),
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(cache_fused.v), np.asarray(cache_scan.v),
        atol=1e-5, rtol=1e-5,
    )


def test_fused_quantized_matches_quantized_scan(rng, monkeypatch):
    """int8 megakernel == int8 scan path (same dequant math)."""
    from qwen3_asr_rs_tpu.weights.quantize import quantize_decoder_params

    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    qparams = quantize_decoder_params(params)
    dec = TextDecoder(cfg, max_position=256)

    cache = KVCache.zeros(cfg, 1, 48, dtype=jnp.float32)
    tok = jnp.asarray([11], jnp.int32)

    monkeypatch.setenv("ASR_DECODE_IMPL", "scan")
    l_scan, c_scan = dec.decode_step(qparams, tok, jnp.int32(20), cache)
    monkeypatch.setenv("ASR_DECODE_IMPL", "fused")
    l_fused, c_fused = dec.decode_step(qparams, tok, jnp.int32(20), cache)

    # the scan path's quant kernel computes in bf16 even for f32 engines,
    # the fused kernel keeps the engine dtype -> small systematic delta
    np.testing.assert_allclose(
        np.asarray(l_fused), np.asarray(l_scan), atol=5e-3, rtol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(c_fused.k), np.asarray(c_scan.k), atol=5e-3, rtol=5e-3
    )


def test_fused_int4g_matches_grouped_scan(rng, monkeypatch):
    """int4g megakernel (per-group VMEM dequant before one MXU dot)
    == the scan path's batched per-group dots."""
    from qwen3_asr_rs_tpu.weights.quantize import quantize_decoder_params

    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    qparams = quantize_decoder_params(
        params, bits=4, group_size=16, lm_bits=8
    )
    assert "qkv_w_q4" in qparams["layers"]  # merged (kernel requirement)
    assert qparams["layers"]["qkv_w_s"].ndim == 3
    dec = TextDecoder(cfg, max_position=256)

    cache = KVCache.zeros(cfg, 1, 48, dtype=jnp.float32)
    tok = jnp.asarray([11], jnp.int32)

    monkeypatch.setenv("ASR_DECODE_IMPL", "scan")
    l_scan, c_scan = dec.decode_step(qparams, tok, jnp.int32(20), cache)
    monkeypatch.setenv("ASR_DECODE_IMPL", "fused")
    l_fused, c_fused = dec.decode_step(qparams, tok, jnp.int32(20), cache)

    # kernel pre-scales weights in the compute dtype, scan path applies
    # f32 scales after per-group dots: reassociation-level differences
    np.testing.assert_allclose(
        np.asarray(l_fused), np.asarray(l_scan), atol=5e-3, rtol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(c_fused.k), np.asarray(c_scan.k), atol=5e-3, rtol=5e-3
    )


def test_fused_int4g_with_int8_kv_matches_scan(rng, monkeypatch):
    """int4g grouped refs + int8-KV scale refs compose (ref ordering)."""
    from qwen3_asr_rs_tpu.weights.quantize import quantize_decoder_params

    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    qparams = quantize_decoder_params(
        params, bits=4, group_size=16, lm_bits=8
    )
    dec = TextDecoder(cfg, max_position=256)
    cache = KVCache.zeros(cfg, 1, 48, dtype=jnp.float32, quantized=True)
    tok = jnp.asarray([7], jnp.int32)

    monkeypatch.setenv("ASR_DECODE_IMPL", "scan")
    l_scan, _ = dec.decode_step(qparams, tok, jnp.int32(12), cache)
    monkeypatch.setenv("ASR_DECODE_IMPL", "fused")
    l_fused, _ = dec.decode_step(qparams, tok, jnp.int32(12), cache)
    np.testing.assert_allclose(
        np.asarray(l_fused), np.asarray(l_scan), atol=5e-3, rtol=5e-3
    )


def test_fused_int4g_unmerged_stays_on_scan(rng, monkeypatch):
    """Unmerged grouped int4 is megakernel-ineligible (scan fallback)."""
    from qwen3_asr_rs_tpu.weights.quantize import quantize_decoder_params

    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    qparams = quantize_decoder_params(
        params, bits=4, merge=False, group_size=16, lm_bits=8
    )
    assert "q_w_q4" in qparams["layers"]
    dec = TextDecoder(cfg, max_position=256)
    cache = KVCache.zeros(cfg, 1, 48, dtype=jnp.float32)
    assert dec._use_fused_step(qparams, 1, jnp.int32(20), cache) == 0


def test_fused_batched_aligned_matches_scan(rng, monkeypatch):
    """Batched right-aligned fused step == scan path (per-example masks)."""
    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    dec = TextDecoder(cfg, max_position=256)
    b, s_max, slot = 3, 64, 40
    kv_start = jnp.asarray([0, 10, 25], jnp.int32)

    cache = KVCache.zeros(cfg, b, s_max, dtype=jnp.float32)
    cache = KVCache(
        k=jnp.asarray(rng.standard_normal(cache.k.shape) * 0.1, jnp.float32),
        v=jnp.asarray(rng.standard_normal(cache.v.shape) * 0.1, jnp.float32),
    )
    toks = jnp.asarray([3, 99, 250], jnp.int32)

    monkeypatch.setenv("ASR_DECODE_IMPL", "scan")
    l_scan, c_scan = dec.decode_step_aligned(
        params, toks, jnp.int32(slot), kv_start, cache
    )
    monkeypatch.setenv("ASR_DECODE_IMPL", "fused")
    l_fused, c_fused = dec.decode_step_aligned(
        params, toks, jnp.int32(slot), kv_start, cache
    )
    np.testing.assert_allclose(
        np.asarray(l_fused), np.asarray(l_scan), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(c_fused.k), np.asarray(c_scan.k), atol=1e-5, rtol=1e-5
    )


def test_fused_multi_step_token_parity(rng, monkeypatch):
    """Several chained fused steps produce the scan path's tokens."""
    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    dec = TextDecoder(cfg, max_position=256)

    def run(impl):
        monkeypatch.setenv("ASR_DECODE_IMPL", impl)
        cache = KVCache.zeros(cfg, 1, 48, dtype=jnp.float32)
        tok = jnp.asarray([7], jnp.int32)
        toks = []
        for i in range(5):
            logits, cache = dec.decode_step(
                params, tok, jnp.int32(10 + i), cache
            )
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            toks.append(int(tok[0]))
        return toks

    assert run("fused") == run("scan")


@pytest.mark.parametrize("tiles", [2, 4])
def test_split_ffn_matches_whole_layer(rng, monkeypatch, tiles):
    """Layer-split FFN streaming (ffn_tiles > 1) == scan path: the tiled
    gate/up/down dots are an exact split of the whole-layer dots up to
    f32 partial-sum reassociation."""
    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    dec = TextDecoder(cfg, max_position=256)

    cache = KVCache.zeros(cfg, 1, 64, dtype=jnp.float32)
    cache = KVCache(
        k=jnp.asarray(rng.standard_normal(cache.k.shape) * 0.1, jnp.float32),
        v=jnp.asarray(rng.standard_normal(cache.v.shape) * 0.1, jnp.float32),
    )
    tok = jnp.asarray([42], jnp.int32)

    monkeypatch.setenv("ASR_DECODE_IMPL", "scan")
    l_scan, c_scan = dec.decode_step(params, tok, jnp.int32(37), cache)

    monkeypatch.setenv("ASR_DECODE_IMPL", "fused")
    monkeypatch.setenv("ASR_FFN_TILES", str(tiles))
    assert dec._use_fused_step(params, 1, jnp.int32(37), cache) == tiles
    l_split, c_split = dec.decode_step(params, tok, jnp.int32(37), cache)

    np.testing.assert_allclose(
        np.asarray(l_split), np.asarray(l_scan), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(c_split.k), np.asarray(c_scan.k), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(c_split.v), np.asarray(c_scan.v), atol=1e-5, rtol=1e-5
    )


def test_split_ffn_multi_step_token_parity(rng, monkeypatch):
    """Chained split-FFN fused steps produce the scan path's tokens,
    including int8 quantized (unmerged) layer params."""
    from qwen3_asr_rs_tpu.weights.quantize import quantize_decoder_params

    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    q8 = quantize_decoder_params(params, merge=False)
    dec = TextDecoder(cfg, max_position=256)

    def run(impl, p, tiles=None, s0=13):
        monkeypatch.setenv("ASR_DECODE_IMPL", impl)
        if tiles is None:
            monkeypatch.delenv("ASR_FFN_TILES", raising=False)
        else:
            monkeypatch.setenv("ASR_FFN_TILES", str(tiles))
        cache = KVCache.zeros(cfg, 1, 48, dtype=jnp.float32)
        tok = jnp.asarray([7], jnp.int32)
        toks = []
        for i in range(5):
            logits, cache = dec.decode_step(
                params if p is None else p, tok, jnp.int32(s0 + i), cache
            )
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            toks.append(int(tok[0]))
        return toks

    assert run("fused", None, tiles=2) == run("scan", None)
    assert run("fused", q8, tiles=2) == run("scan", q8)


def test_fused_step_vmem_guard():
    """Megakernel dispatch must refuse configurations whose
    double-buffered blocks exceed the kernel's VMEM budget — and, since
    the slab now stays in HBM (manual DMA), must ACCEPT even the 360 s
    bucket's slab that failed the round-1 resident-block design."""
    from qwen3_asr_rs_tpu.config import AsrConfig

    cfg = AsrConfig().text  # real 0.6B shapes
    dec = TextDecoder(cfg, max_position=16)
    # fake param tree: only dtype/keys are inspected by the guard
    params = {"layers": {"q_w": jnp.zeros((1, 1), jnp.bfloat16)}}

    for s_max in (4833, 8833):  # 30 s and 360 s buckets
        cache = KVCache.zeros(cfg, 1, s_max, dtype=jnp.bfloat16)
        assert dec._fused_step_tiles(params, 1, cache) == 1, s_max
        assert dec._fused_step_tiles(params, 1, cache, fold_lm=True) == 1

    # an over-budget case (huge batch): guard refuses even when forced.
    # The guard only reads shapes/dtypes, so use abstract stand-ins
    # instead of allocating a multi-GB slab.
    import jax

    big_b = KVCache(
        k=jax.ShapeDtypeStruct((24, 512, 8, 4833, 128), jnp.bfloat16),
        v=jax.ShapeDtypeStruct((24, 512, 8, 4833, 128), jnp.bfloat16),
    )
    assert dec._fused_step_tiles(params, 512, big_b) == 0
    import os

    os.environ["ASR_DECODE_IMPL"] = "fused"
    try:
        assert not dec._use_fused_step(params, 512, jnp.int32(0), big_b)
    finally:
        del os.environ["ASR_DECODE_IMPL"]


def test_fused_step_tiles_17b_split():
    """1.7B bf16 (~100 MB/layer) exceeds the whole-layer VMEM budget but
    must select layer-split FFN streaming, not the scan fallback
    (VERDICT r2 #1: 1.7B bf16 routed to scan at 44x)."""
    from qwen3_asr_rs_tpu.config import synthetic_17b_config

    cfg = synthetic_17b_config().text
    dec = TextDecoder(cfg, max_position=16)
    params = {"layers": {"q_w": jnp.zeros((1, 1), jnp.bfloat16)}}
    cache = KVCache.zeros(cfg, 1, 704, dtype=jnp.bfloat16)
    nt = dec._fused_step_tiles(params, 1, cache)
    # split engaged with the measured-best ~10 MB ffn tiles (nt=8 at
    # 1.7B bf16: 4.88 ms/token vs 5.04 at nt=4, PERFORMANCE.md round 3b)
    assert nt == 8, nt

    # int8 1.7B fits whole (50 MB/layer): no split
    params8 = {"layers": {"q_w_q": jnp.zeros((1, 1), jnp.int8)}}
    assert dec._fused_step_tiles(params8, 1, cache) == 1

    # int4/merged params cannot split: whole-layer or nothing
    params4 = {"layers": {"qkv_w_q4": jnp.zeros((1, 1), jnp.int8)}}
    assert dec._fused_step_tiles(params4, 1, cache) == 1


def test_decode_attn_threshold_scales_with_launch_cost(monkeypatch):
    """Crossover derives from the measured pallas launch overhead."""
    monkeypatch.delenv("ASR_DECODE_ATTN_THRESHOLD", raising=False)
    monkeypatch.delenv("ASR_PALLAS_LAUNCH_US", raising=False)
    assert TextDecoder.decode_attn_threshold() == 6144  # tunnel default
    monkeypatch.setenv("ASR_PALLAS_LAUNCH_US", "18.5")
    assert TextDecoder.decode_attn_threshold() == 3072
    monkeypatch.setenv("ASR_PALLAS_LAUNCH_US", "0.5")
    assert TextDecoder.decode_attn_threshold() >= 256  # floor
    monkeypatch.setenv("ASR_DECODE_ATTN_THRESHOLD", "9999")
    assert TextDecoder.decode_attn_threshold() == 9999  # direct override


@pytest.mark.parametrize("quantized", [False, True])
def test_fused_token_step_matches_scan_argmax(rng, monkeypatch, quantized):
    """decode_step_token with folded final-norm+lm_head+argmax must emit
    the same token as the scan path's decode_step + XLA argmax."""
    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    if quantized:
        from qwen3_asr_rs_tpu.weights.quantize import quantize_decoder_params

        params = quantize_decoder_params(params)
    dec = TextDecoder(cfg, max_position=256)

    cache = KVCache.zeros(cfg, 1, 64, dtype=jnp.float32)
    cache = KVCache(
        k=jnp.asarray(rng.standard_normal(cache.k.shape) * 0.1, jnp.float32),
        v=jnp.asarray(rng.standard_normal(cache.v.shape) * 0.1, jnp.float32),
    )
    tok = jnp.asarray([42], jnp.int32)

    monkeypatch.setenv("ASR_DECODE_IMPL", "scan")
    logits, cache_scan = dec.decode_step(params, tok, jnp.int32(37), cache)
    want = int(jnp.argmax(logits, -1)[0])

    monkeypatch.setenv("ASR_DECODE_IMPL", "fused")
    monkeypatch.setenv("ASR_FOLD_LM", "1")
    got, cache_fused = dec.decode_step_token(
        params, tok, jnp.int32(37), cache
    )
    assert int(got[0]) == want
    np.testing.assert_allclose(
        np.asarray(cache_fused.k), np.asarray(cache_scan.k),
        atol=1e-5, rtol=1e-5,
    )


def test_fused_aligned_token_step_matches_scan(rng, monkeypatch):
    """Aligned (batched, shared-slot) folded token step == scan argmax."""
    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    dec = TextDecoder(cfg, max_position=256)

    b = 3
    cache = KVCache.zeros(cfg, b, 64, dtype=jnp.float32)
    cache = KVCache(
        k=jnp.asarray(rng.standard_normal(cache.k.shape) * 0.1, jnp.float32),
        v=jnp.asarray(rng.standard_normal(cache.v.shape) * 0.1, jnp.float32),
    )
    tok = jnp.asarray([42, 7, 300], jnp.int32)
    kv_start = jnp.asarray([5, 12, 0], jnp.int32)

    monkeypatch.setenv("ASR_DECODE_IMPL", "scan")
    logits, _ = dec.decode_step_aligned(
        params, tok, jnp.int32(40), kv_start, cache
    )
    want = np.asarray(jnp.argmax(logits, -1))

    monkeypatch.setenv("ASR_DECODE_IMPL", "fused")
    monkeypatch.setenv("ASR_FOLD_LM", "1")
    got, _ = dec.decode_step_aligned_token(
        params, tok, jnp.int32(40), kv_start, cache
    )
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("s_max,pos", [(1200, 700), (96, 5)])
def test_fused_dma_slab_mode_matches_scan(rng, monkeypatch, s_max, pos):
    """The manual-DMA slab mode (big generation caps) == scan path."""
    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    dec = TextDecoder(cfg, max_position=2048)

    cache = KVCache.zeros(cfg, 1, s_max, dtype=jnp.float32)
    cache = KVCache(
        k=jnp.asarray(rng.standard_normal(cache.k.shape) * 0.1, jnp.float32),
        v=jnp.asarray(rng.standard_normal(cache.v.shape) * 0.1, jnp.float32),
    )
    tok = jnp.asarray([42], jnp.int32)

    monkeypatch.setenv("ASR_DECODE_IMPL", "scan")
    l_scan, c_scan = dec.decode_step(params, tok, jnp.int32(pos), cache)

    monkeypatch.setenv("ASR_DECODE_IMPL", "fused")
    monkeypatch.setenv("ASR_SLAB_MODE", "dma")
    l_dma, c_dma = dec.decode_step(params, tok, jnp.int32(pos), cache)

    np.testing.assert_allclose(
        np.asarray(l_dma), np.asarray(l_scan), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(c_dma.k), np.asarray(c_scan.k), atol=1e-5, rtol=1e-5
    )


def test_fused_int4_matches_int4_scan(rng, monkeypatch):
    """int4 megakernel (nibble unpack in-kernel) == int4 XLA scan path."""
    from qwen3_asr_rs_tpu.weights.quantize import quantize_decoder_params

    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    qparams = quantize_decoder_params(params, bits=4)
    dec = TextDecoder(cfg, max_position=256)

    cache = KVCache.zeros(cfg, 1, 48, dtype=jnp.float32)
    tok = jnp.asarray([11], jnp.int32)

    monkeypatch.setenv("ASR_DECODE_IMPL", "scan")
    l_scan, c_scan = dec.decode_step(qparams, tok, jnp.int32(20), cache)
    monkeypatch.setenv("ASR_DECODE_IMPL", "fused")
    l_fused, c_fused = dec.decode_step(qparams, tok, jnp.int32(20), cache)

    np.testing.assert_allclose(
        np.asarray(l_fused), np.asarray(l_scan), atol=5e-3, rtol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(c_fused.k), np.asarray(c_scan.k), atol=5e-3, rtol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(c_fused.v), np.asarray(c_scan.v), atol=5e-3, rtol=5e-3
    )


def test_split_ffn_with_folded_lm_matches_scan_argmax(rng, monkeypatch):
    """Layer-split FFN composes with lm-head folding: the lm tile steps
    start after num_layers * (1 + tiles) grid steps and still emit the
    scan path's argmax token."""
    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    dec = TextDecoder(cfg, max_position=256)

    cache = KVCache.zeros(cfg, 1, 64, dtype=jnp.float32)
    cache = KVCache(
        k=jnp.asarray(rng.standard_normal(cache.k.shape) * 0.1, jnp.float32),
        v=jnp.asarray(rng.standard_normal(cache.v.shape) * 0.1, jnp.float32),
    )
    tok = jnp.asarray([42], jnp.int32)

    monkeypatch.setenv("ASR_DECODE_IMPL", "scan")
    logits, cache_scan = dec.decode_step(params, tok, jnp.int32(37), cache)
    want = int(jnp.argmax(logits, -1)[0])

    monkeypatch.setenv("ASR_DECODE_IMPL", "fused")
    monkeypatch.setenv("ASR_FOLD_LM", "1")
    monkeypatch.setenv("ASR_FFN_TILES", "2")
    got, cache_fused = dec.decode_step_token(
        params, tok, jnp.int32(37), cache
    )
    assert int(got[0]) == want
    np.testing.assert_allclose(
        np.asarray(cache_fused.k), np.asarray(cache_scan.k),
        atol=1e-5, rtol=1e-5,
    )


@pytest.mark.parametrize("quantized", [False, True])
def test_prepared_lm_fold_matches_unprepared(rng, monkeypatch, quantized):
    """Engine-style prepared lm-fold operands (prepare_lm_fold once,
    lm_fold_w/lm_fold_s in params) emit the same token as in-call prep
    and as the scan path's argmax."""
    from qwen3_asr_rs_tpu.ops.pallas.decode_layer import prepare_lm_fold

    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    if quantized:
        from qwen3_asr_rs_tpu.weights.quantize import quantize_decoder_params

        params = quantize_decoder_params(params)
    dec = TextDecoder(cfg, max_position=256)

    cache = KVCache.zeros(cfg, 1, 64, dtype=jnp.float32)
    cache = KVCache(
        k=jnp.asarray(rng.standard_normal(cache.k.shape) * 0.1, jnp.float32),
        v=jnp.asarray(rng.standard_normal(cache.v.shape) * 0.1, jnp.float32),
    )
    tok = jnp.asarray([42], jnp.int32)

    monkeypatch.setenv("ASR_DECODE_IMPL", "scan")
    logits, _ = dec.decode_step(params, tok, jnp.int32(37), cache)
    want = int(jnp.argmax(logits, -1)[0])

    monkeypatch.setenv("ASR_DECODE_IMPL", "fused")
    monkeypatch.setenv("ASR_FOLD_LM", "1")
    got_incall, _ = dec.decode_step_token(params, tok, jnp.int32(37), cache)

    prepped = dict(params)
    lm = params.get("lm_head", params.get("lm_head_q"))
    w, s = prepare_lm_fold(lm, params.get("lm_head_s"))
    prepped["lm_fold_w"] = w
    prepped["lm_fold_s"] = s
    got_prep, _ = dec.decode_step_token(prepped, tok, jnp.int32(37), cache)

    assert int(got_incall[0]) == want
    assert int(got_prep[0]) == want


def test_forced_ffn_tiles_misaligned_falls_back_to_scan(monkeypatch):
    """A forced ASR_FFN_TILES whose tile is not 128-lane aligned must
    degrade to the scan path (0) on TPU (Mosaic would reject the tile
    and crash the transcribe graph); interpret mode allows any even
    split."""
    import qwen3_asr_rs_tpu.models.text_decoder as td

    monkeypatch.setattr(td, "_interpret_pallas", lambda: False)
    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    dec = TextDecoder(cfg, max_position=128)
    cache = KVCache.zeros(cfg, 1, 32, dtype=jnp.float32)
    inter = cfg.intermediate_size
    # pick a divisor of inter whose tile width is NOT a multiple of 128
    forced = next(
        (n for n in range(2, inter + 1)
         if inter % n == 0 and (inter // n) % 128), None,
    )
    assert forced is not None, "tiny config should have such a divisor"
    monkeypatch.setenv("ASR_FFN_TILES", str(forced))
    assert dec._fused_step_tiles(params, 1, cache) == 0
