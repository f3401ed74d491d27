"""Quantized decoder path: logits parity vs dequantized weights + e2e."""

import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_rs_tpu.config import tiny_test_config
from qwen3_asr_rs_tpu.models.text_decoder import TextDecoder, init_decoder_params
from qwen3_asr_rs_tpu.ops.pallas.quant_matmul import dequantize
from qwen3_asr_rs_tpu.runtime.engine import AsrEngine
from qwen3_asr_rs_tpu.weights.quantize import (
    QUANT_LAYER_WEIGHTS,
    is_quantized,
    quantize_decoder_params,
)

from test_engine_e2e import MockTokenizer, make_engine


def test_quantized_forward_matches_dequantized_reference(rng):
    """int8 pallas path == forward with explicitly dequantized bf16 weights."""
    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    qparams = quantize_decoder_params(params, merge=False)
    assert is_quantized(qparams)

    # reference: plain decoder with the dequantized weights
    deq = {
        "embed": params["embed"],
        "final_ln_w": params["final_ln_w"],
        "layers": dict(qparams["layers"]),
        "lm_head": jnp.transpose(
            dequantize(qparams["lm_head_q"], qparams["lm_head_s"])
        ),
    }
    for name in QUANT_LAYER_WEIGHTS:
        w_q = qparams["layers"][f"{name}_q"]
        s = qparams["layers"][f"{name}_s"]
        deq["layers"][name] = jnp.stack(
            [dequantize(w_q[i], s[i]) for i in range(w_q.shape[0])]
        )
        del deq["layers"][f"{name}_q"], deq["layers"][f"{name}_s"]

    dec = TextDecoder(cfg, max_position=64)
    ids = jnp.asarray([[3, 7, 1, 9, 2]], jnp.int32)
    hidden = dec.embed(params, ids)
    got = dec.forward_full(qparams, hidden, jnp.arange(5))
    want = dec.forward_full(deq, hidden, jnp.arange(5))
    # the quantized kernel computes in bf16 (f32 accumulation); the
    # reference path is f32 throughout — tolerance reflects bf16 rounding
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-2, rtol=2e-2
    )


@pytest.mark.slow
def test_engine_with_int8_quantization(rng):
    _, cfg, enc_params, dec_params = make_engine(max_new=4)
    eng = AsrEngine(
        model_dir=None, dtype=jnp.float32, max_new_tokens=4,
        chunk_buckets=(2, 4), config=cfg,
        params=(enc_params, dec_params), tokenizer=MockTokenizer(),
        quantize="int8",
    )
    samples = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    result = eng.transcribe_samples(samples)
    assert isinstance(result.raw_output, str)


# ---------------------------------------------------------------------- #
# int4 (nibble-packed)


def test_int4_pack_unpack_roundtrip(rng):
    """unpack(pack(w)) reproduces the clipped int4 grid exactly."""
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.ops.pallas.quant_matmul import (
        quantize_weight_int4,
        unpack_int4,
    )

    w = rng.standard_normal((48, 64)).astype(np.float32)
    packed, scales = quantize_weight_int4(jnp.asarray(w))
    assert packed.shape == (48, 32) and packed.dtype == jnp.int8
    got = np.asarray(unpack_int4(packed))
    want = np.clip(np.round(w / np.asarray(scales)[None, :]), -7, 7)
    np.testing.assert_array_equal(got, want)


def test_int4_linear_matches_dequantized(rng):
    """_linear's int4 branch == x @ dequantized weights."""
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.models.text_decoder import _linear
    from qwen3_asr_rs_tpu.ops.pallas.quant_matmul import (
        quantize_weight_int4,
        unpack_int4,
    )

    w = rng.standard_normal((32, 48)).astype(np.float32) * 0.1
    x = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    packed, scales = quantize_weight_int4(jnp.asarray(w))
    got = np.asarray(_linear({"t_w_q4": packed, "t_w_s": scales}, "t_w", x))
    deq = np.asarray(unpack_int4(packed)) * np.asarray(scales)[None, :]
    want = np.asarray(x) @ deq
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_int4_forward_matches_dequantized_reference(rng):
    """int4 XLA path == forward with explicitly dequantized weights."""
    from qwen3_asr_rs_tpu.ops.pallas.quant_matmul import unpack_int4

    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    qparams = quantize_decoder_params(
        params, bits=4, merge=False, lm_bits=8
    )
    assert is_quantized(qparams)

    deq = {
        "embed": params["embed"],
        "final_ln_w": params["final_ln_w"],
        "layers": dict(qparams["layers"]),
        "lm_head": jnp.transpose(
            dequantize(qparams["lm_head_q"], qparams["lm_head_s"])
        ),
    }
    for name in QUANT_LAYER_WEIGHTS:
        w_q = qparams["layers"][f"{name}_q4"]
        s = qparams["layers"][f"{name}_s"]
        deq["layers"][name] = jnp.stack(
            [
                unpack_int4(w_q[i]) * s[i][None, :]
                for i in range(w_q.shape[0])
            ]
        )
        del deq["layers"][f"{name}_q4"], deq["layers"][f"{name}_s"]

    dec = TextDecoder(cfg, max_position=64)
    ids = jnp.asarray([[3, 7, 1, 9, 2]], jnp.int32)
    hidden = dec.embed(params, ids)
    got = dec.forward_full(qparams, hidden, jnp.arange(5))
    want = dec.forward_full(deq, hidden, jnp.arange(5))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-2, rtol=2e-2
    )


def test_int8_layers_with_int4_lm_head(rng):
    """lm_bits=4 is honored under bits=8 (was silently ignored; ADVICE
    r2): layers quantize int8, lm_head packs int4, logits stay close to
    the int8-lm_head reference."""
    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    q84 = quantize_decoder_params(params, bits=8, merge=False, lm_bits=4)
    assert "lm_head_q4" in q84 and "lm_head_q" not in q84
    assert "q_w_q" in q84["layers"]  # layers stay int8

    # reference: same int8 layers, lm_head explicitly dequantized from
    # the SAME int4 values (tile-local packing, see
    # quantize_weight_int4_tiled) through the plain einsum path
    from qwen3_asr_rs_tpu.ops.pallas.quant_matmul import MATVEC_TILE

    p = np.asarray(q84["lm_head_q4"], np.int32)
    k, half = p.shape
    n_pad = half * 2
    lo = (p << 28) >> 28
    hi = p >> 4
    w = np.zeros((k, n_pad), np.float32)
    wr = w.reshape(k, -1, MATVEC_TILE)
    wr[:, :, : MATVEC_TILE // 2] = lo.reshape(k, -1, MATVEC_TILE // 2)
    wr[:, :, MATVEC_TILE // 2 :] = hi.reshape(k, -1, MATVEC_TILE // 2)
    s = np.asarray(q84["lm_head_s"], np.float32)
    deq_lm = (w[:, : s.shape[0]] * s[None, :]).T  # (V, H)
    ref = {key: v for key, v in q84.items()
           if key not in ("lm_head_q4", "lm_head_s")}
    ref["lm_head"] = jnp.asarray(deq_lm)

    dec = TextDecoder(cfg, max_position=64)
    ids = jnp.asarray([[3, 7, 1, 9, 2]], jnp.int32)
    hidden = dec.embed(params, ids)
    got = dec.forward_full(q84, hidden, jnp.arange(5))
    want = dec.forward_full(ref, hidden, jnp.arange(5))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-3, rtol=2e-3
    )

    import pytest

    with pytest.raises(ValueError, match="lm_bits"):
        quantize_decoder_params(params, bits=8, lm_bits=3)


def test_quant_bits_detection():
    from qwen3_asr_rs_tpu.weights.quantize import quant_bits

    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    assert quant_bits(params) == 0
    assert quant_bits(quantize_decoder_params(params)) == 8
    assert quant_bits(quantize_decoder_params(params, bits=4)) == 4


@pytest.mark.slow
def test_engine_with_int4_quantization(rng):
    _, cfg, enc_params, dec_params = make_engine(max_new=4)
    eng = AsrEngine(
        model_dir=None, dtype=jnp.float32, max_new_tokens=4,
        chunk_buckets=(2, 4), config=cfg,
        params=(enc_params, dec_params), tokenizer=MockTokenizer(),
        quantize="int4",
    )
    samples = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    result = eng.transcribe_samples(samples)
    assert isinstance(result.raw_output, str)


@pytest.mark.slow
def test_merged_qkv_gateup_matches_separate(rng):
    """Merged qkv/gateup quantization == separate projections (both bits).

    Column-concat commutes with the contraction and scales are
    per-output-column, so the merged layout is the same math; XLA may
    reassociate the wider dot, hence a ~1 ulp tolerance rather than 0.
    """
    from qwen3_asr_rs_tpu.models.text_decoder import KVCache

    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    dec = TextDecoder(cfg, max_position=64)
    ids = jnp.asarray([[3, 7, 1, 9, 2]], jnp.int32)
    hidden = dec.embed(params, ids)

    for bits in (8, 4):
        qm = quantize_decoder_params(params, bits=bits, merge=True)
        qs = quantize_decoder_params(params, bits=bits, merge=False)
        suffix = "_q4" if bits == 4 else "_q"
        assert f"qkv_w{suffix}" in qm["layers"]
        assert f"gateup_w{suffix}" in qm["layers"]
        assert f"q_w{suffix}" not in qm["layers"]

        got = dec.forward_full(qm, hidden, jnp.arange(5))
        want = dec.forward_full(qs, hidden, jnp.arange(5))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-5
        )

        # decode path (stale-slab scan) parity too
        cache = KVCache.zeros(cfg, 1, 16, dtype=jnp.float32)
        _, cm = dec.prefill(qm, hidden, jnp.arange(5), cache, jnp.int32(5))
        _, cs = dec.prefill(qs, hidden, jnp.arange(5), cache, jnp.int32(5))
        tok = jnp.asarray([3], jnp.int32)
        lm, _ = dec.decode_step(qm, tok, jnp.int32(5), cm)
        ls, _ = dec.decode_step(qs, tok, jnp.int32(5), cs)
        np.testing.assert_allclose(
            np.asarray(lm), np.asarray(ls), atol=1e-4, rtol=1e-5
        )


@pytest.mark.slow
def test_engine_with_lm8_quantization(rng):
    """bf16 layers + int8 lm_head: mildest quality knob, runs e2e."""
    _, cfg, enc_params, dec_params = make_engine(max_new=4)
    eng = AsrEngine(
        model_dir=None, dtype=jnp.float32, max_new_tokens=4,
        chunk_buckets=(2, 4), config=cfg,
        params=(enc_params, dec_params), tokenizer=MockTokenizer(),
        quantize="lm8",
    )
    assert "lm_head_q" in eng.dec_params
    assert "q_w" in eng.dec_params["layers"]  # layers untouched
    samples = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    out = eng.transcribe_samples(samples)
    assert isinstance(out.text, str)


def test_quantize_strips_stale_lm_fold_operands(rng):
    """Engine-prepared lm_fold_* keys are derived from the lm_head the
    quantizers replace; a stale bf16 copy must not survive."""
    from qwen3_asr_rs_tpu.config import tiny_test_config
    from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params
    from qwen3_asr_rs_tpu.ops.pallas.decode_layer import prepare_lm_fold
    from qwen3_asr_rs_tpu.weights.quantize import (
        quantize_decoder_params, quantize_lm_head_only,
    )

    params = init_decoder_params(tiny_test_config().text, dtype=jnp.float32)
    w, s = prepare_lm_fold(params["lm_head"])
    params = dict(params)
    params["lm_fold_w"], params["lm_fold_s"] = w, s
    q8 = quantize_decoder_params(params)
    assert "lm_fold_w" not in q8 and "lm_fold_s" not in q8
    lm8 = quantize_lm_head_only(params)
    assert "lm_fold_w" not in lm8 and "lm_fold_s" not in lm8


def test_engine_merge_qkv_env_override(rng, monkeypatch):
    """ASR_MERGE_QKV=0 keeps per-projection int8 weights (required for
    the megakernel's layer-split mode at 1.7B-class sizes)."""
    import dataclasses

    from qwen3_asr_rs_tpu.config import tiny_test_config
    from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
    from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params
    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine

    cfg = tiny_test_config()
    text = dataclasses.replace(cfg.text, vocab_size=151936)
    cfg = dataclasses.replace(
        cfg,
        thinker_config=dataclasses.replace(cfg.thinker_config,
                                           text_config=text),
    )
    enc = init_encoder_params(cfg.audio, dtype=jnp.float32)
    dec = init_decoder_params(cfg.text, dtype=jnp.float32)

    class _Tok:
        def encode(self, t):
            return [101]

        def decode(self, ids):
            return ""

    def build():
        return AsrEngine(
            model_dir=None, dtype=jnp.float32, max_new_tokens=2,
            chunk_buckets=(2,), config=cfg, params=(enc, dec),
            tokenizer=_Tok(), quantize="int8",
        )

    merged = build()
    assert "qkv_w_q" in merged.dec_params["layers"]
    monkeypatch.setenv("ASR_MERGE_QKV", "0")
    unmerged = build()
    assert "qkv_w_q" not in unmerged.dec_params["layers"]
    assert "q_w_q" in unmerged.dec_params["layers"]


# ---------------------------------------------------------------------- #
# int4 group-wise scales (quantize='int4g')


def test_int4_grouped_roundtrip_and_matmul(rng):
    """Grouped dequant hits the int4 grid exactly; the batched-per-group
    matmul matches the dense dequantized product."""
    from qwen3_asr_rs_tpu.ops.pallas.quant_matmul import (
        dequantize_int4_grouped,
        int4_grouped_matmul,
        quantize_weight_int4_grouped,
    )

    k, n, g = 64, 32, 16
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.1, jnp.float32)
    packed, scales = quantize_weight_int4_grouped(w, group_size=g)
    assert packed.shape == (k, n // 2) and scales.shape == (k // g, n)
    deq = dequantize_int4_grouped(packed, scales)
    # quantization error bounded by half a grid step per group
    step = np.repeat(np.asarray(scales), g, axis=0)
    assert np.all(np.abs(np.asarray(deq) - np.asarray(w)) <= step / 2 + 1e-7)

    x = jnp.asarray(rng.standard_normal((3, k)) * 0.5, jnp.float32)
    got = int4_grouped_matmul(x, packed, scales)
    want = x @ deq
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
    )


def test_int4_grouped_clamps_group_size_to_k_divisor(rng):
    """K smaller than (or not a multiple of) the requested group size
    clamps to the largest divisor instead of raising — tiny/test
    configs (K=64 < default 128) must still run int4g end to end."""
    from qwen3_asr_rs_tpu.ops.pallas.quant_matmul import (
        dequantize_int4_grouped,
        quantize_weight_int4_grouped,
    )

    for k, req, eff in ((64, 128, 64), (96, 128, 96), (80, 32, 20)):
        w = jnp.asarray(rng.standard_normal((k, 32)) * 0.1, jnp.float32)
        packed, scales = quantize_weight_int4_grouped(w, group_size=req)
        assert scales.shape == (k // eff, 32), (k, req, scales.shape)
        deq = dequantize_int4_grouped(packed, scales)
        step = np.repeat(np.asarray(scales), eff, axis=0)
        assert np.all(
            np.abs(np.asarray(deq) - np.asarray(w)) <= step / 2 + 1e-7
        )


def test_int4_grouped_beats_per_channel_on_outliers(rng):
    """The motivating case: one outlier row per channel crushes
    per-channel int4 resolution; group-wise scales contain the damage
    to the outlier's group."""
    from qwen3_asr_rs_tpu.ops.pallas.quant_matmul import (
        dequantize,
        dequantize_int4_grouped,
        quantize_weight_int4,
        quantize_weight_int4_grouped,
        unpack_int4,
    )

    k, n = 256, 64
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    w[7] *= 50.0  # one outlier input row
    wj = jnp.asarray(w)
    p_pc, s_pc = quantize_weight_int4(wj)
    deq_pc = unpack_int4(p_pc, jnp.float32) * s_pc[None, :]
    p_g, s_g = quantize_weight_int4_grouped(wj, group_size=64)
    deq_g = dequantize_int4_grouped(p_g, s_g)
    mask = np.ones(k, bool)
    mask[7] = False  # error off the outlier row
    err_pc = np.abs(np.asarray(deq_pc) - w)[mask].mean()
    err_g = np.abs(np.asarray(deq_g) - w)[mask].mean()
    assert err_g < err_pc / 2, (err_g, err_pc)


def test_int4g_forward_matches_dequantized_reference(rng):
    """int4g decoder forward == forward with densely dequantized bf16
    weights (per-group scales)."""
    from qwen3_asr_rs_tpu.ops.pallas.quant_matmul import (
        dequantize_int4_grouped,
    )

    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    qparams = quantize_decoder_params(
        params, bits=4, merge=False, group_size=16, lm_bits=8
    )
    assert qparams["layers"]["q_w_s"].ndim == 3  # (L, G, N)

    deq = {
        "embed": params["embed"],
        "final_ln_w": params["final_ln_w"],
        "layers": dict(qparams["layers"]),
        "lm_head": jnp.transpose(
            dequantize(qparams["lm_head_q"], qparams["lm_head_s"])
        ),
    }
    for name in QUANT_LAYER_WEIGHTS:
        w_q = qparams["layers"][f"{name}_q4"]
        s = qparams["layers"][f"{name}_s"]
        deq["layers"][name] = jnp.stack(
            [
                dequantize_int4_grouped(w_q[i], s[i])
                for i in range(w_q.shape[0])
            ]
        )
        del deq["layers"][f"{name}_q4"], deq["layers"][f"{name}_s"]

    dec = TextDecoder(cfg, max_position=64)
    ids = jnp.asarray([[3, 7, 1, 9, 2]], jnp.int32)
    hidden = dec.embed(params, ids)
    got = dec.forward_full(qparams, hidden, jnp.arange(5))
    want = dec.forward_full(deq, hidden, jnp.arange(5))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-2, rtol=2e-2
    )


def test_quantize_group_size_validation():
    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    with pytest.raises(ValueError, match="bits=4"):
        quantize_decoder_params(params, bits=8, group_size=64)
    with pytest.raises(ValueError, match="tensor"):
        quantize_decoder_params(
            params, bits=4, merge=False, group_size=16, tp_blocks=2
        )


@pytest.mark.slow
def test_engine_with_int4g_quantization(rng, monkeypatch):
    """quantize='int4g' end to end: decodes through the scan path (the
    megakernel rejects grouped scales) and emits the same tokens as a
    decoder running the densely dequantized int4g weights."""
    import dataclasses

    from qwen3_asr_rs_tpu.ops.pallas.quant_matmul import (
        dequantize_int4_grouped,
    )

    monkeypatch.setenv("ASR_INT4_GROUP", "16")
    _, cfg, enc_params, dec_params = make_engine(max_new=4)
    eng = AsrEngine(
        model_dir=None, dtype=jnp.float32, max_new_tokens=4,
        chunk_buckets=(2, 4), config=cfg,
        params=(enc_params, dec_params), tokenizer=MockTokenizer(),
        quantize="int4g",
    )
    layers = eng.dec_params["layers"]
    assert "qkv_w_q4" in layers and layers["qkv_w_s"].ndim == 3
    assert "lm_head_q" in eng.dec_params  # lm defaults to int8 under int4g

    # reference engine: densely dequantized int4g weights, bf16 path.
    # Merged qkv/gateup tensors split back to per-projection names (the
    # dense decoder only reads merged layouts when they are quantized);
    # merged per-column scales equal unmerged ones, so the split is exact.
    tcfg = cfg.text
    nq = tcfg.num_attention_heads * tcfg.head_dim
    nkv = tcfg.num_key_value_heads * tcfg.head_dim
    splits = {
        "qkv_w": (("q_w", "k_w", "v_w"), (nq, nq + nkv)),
        "gateup_w": (("gate_w", "up_w"), (tcfg.intermediate_size,)),
    }
    deq_layers = dict(layers)
    for name in list(deq_layers):
        if name.endswith("_q4"):
            base = name[:-3]
            w_q = deq_layers.pop(name)
            s = deq_layers.pop(f"{base}_s")
            dense = jnp.stack(
                [
                    dequantize_int4_grouped(w_q[i], s[i])
                    for i in range(w_q.shape[0])
                ]
            )
            if base in splits:
                names, cuts = splits[base]
                for part_name, part in zip(
                    names, jnp.split(dense, list(cuts), axis=-1)
                ):
                    deq_layers[part_name] = part
            else:
                deq_layers[base] = dense
    deq_params = dict(eng.dec_params)
    deq_params["layers"] = deq_layers
    deq_params["lm_head"] = jnp.transpose(
        dequantize(deq_params.pop("lm_head_q"), deq_params.pop("lm_head_s"))
    )
    ref = AsrEngine(
        model_dir=None, dtype=jnp.float32, max_new_tokens=4,
        chunk_buckets=(2, 4), config=cfg,
        params=(enc_params, deq_params), tokenizer=MockTokenizer(),
    )

    samples = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    got = eng.transcribe_samples(samples)
    want = ref.transcribe_samples(samples)
    assert got.raw_output == want.raw_output


def test_engine_int4g_rejected_under_tp():
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs 2 devices")
    from qwen3_asr_rs_tpu.parallel.mesh import make_mesh

    _, cfg, enc_params, dec_params = make_engine(max_new=2)
    mesh = make_mesh(n_devices=2, tp_divisor_of=cfg.text.num_key_value_heads)
    with pytest.raises(ValueError, match="int4g"):
        AsrEngine(
            model_dir=None, dtype=jnp.float32, max_new_tokens=2,
            chunk_buckets=(2,), config=cfg,
            params=(enc_params, dec_params), tokenizer=MockTokenizer(),
            quantize="int4g", mesh=mesh,
        )
