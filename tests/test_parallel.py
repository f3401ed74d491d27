"""Multi-device tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_rs_tpu.config import tiny_test_config
from qwen3_asr_rs_tpu.models.text_decoder import TextDecoder, init_decoder_params
from qwen3_asr_rs_tpu.parallel.mesh import make_mesh
from qwen3_asr_rs_tpu.parallel.sharding import (
    decoder_param_specs,
    shard_params,
)

pytestmark = pytest.mark.slow  # heavy parity/e2e: quick tier skips

requires_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


@requires_8
def test_make_mesh_factorization():
    mesh = make_mesh(n_devices=8, tp_divisor_of=8)
    assert mesh.shape["dp"] * mesh.shape["tp"] == 8
    assert mesh.shape["tp"] == 8  # 8 | 8
    mesh = make_mesh(n_devices=8, tp_divisor_of=2)
    assert mesh.shape["tp"] == 2 and mesh.shape["dp"] == 4
    mesh = make_mesh(n_devices=4, dp=2)
    assert mesh.shape == {"dp": 2, "tp": 2}


@requires_8
def test_tp_sharded_decoder_matches_single_device():
    """TP-sharded forward must be numerically identical to unsharded."""
    cfg = tiny_test_config().text  # 2 kv heads -> tp=2
    params = init_decoder_params(cfg, dtype=jnp.float32)
    dec = TextDecoder(cfg, max_position=64)

    ids = jnp.asarray([[5, 8, 1, 13, 2]], dtype=jnp.int32)
    hidden = dec.embed(params, ids)
    expected = np.asarray(dec.forward_full(params, hidden, jnp.arange(5)))

    mesh = make_mesh(n_devices=8, tp_divisor_of=cfg.num_key_value_heads)
    with mesh:
        sharded = shard_params(params, mesh, decoder_param_specs())
        fn = jax.jit(lambda p, h: dec.forward_full(p, h, jnp.arange(5)))
        got = np.asarray(fn(sharded, dec.embed(sharded, ids)))

    np.testing.assert_allclose(got, expected, atol=1e-4, rtol=1e-4)


@requires_8
def test_mesh_sharded_engine_matches_single_device(rng):
    """Full fused inference graph under GSPMD == single-device tokens."""
    import dataclasses

    from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine
    from test_engine_e2e import MockTokenizer

    cfg = tiny_test_config()
    text = dataclasses.replace(cfg.text, vocab_size=151936)
    cfg = dataclasses.replace(
        cfg,
        thinker_config=dataclasses.replace(cfg.thinker_config,
                                           text_config=text),
    )
    enc_params = init_encoder_params(cfg.audio, dtype=jnp.float32)
    dec_params = init_decoder_params(cfg.text, dtype=jnp.float32)

    def engine(mesh):
        return AsrEngine(
            model_dir=None, dtype=jnp.float32, max_new_tokens=4,
            chunk_buckets=(2,), config=cfg,
            params=(enc_params, dec_params), tokenizer=MockTokenizer(),
            mesh=mesh,
        )

    samples = (rng.standard_normal(20000) * 0.1).astype(np.float32)
    single = engine(None).transcribe_samples(samples)
    mesh = make_mesh(n_devices=8,
                     tp_divisor_of=cfg.text.num_key_value_heads)
    sharded = engine(mesh).transcribe_samples(samples)
    assert sharded.raw_output == single.raw_output


@requires_8
def test_dryrun_multichip_entry():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@requires_8
def test_mesh_plus_int8_matches_single_device(rng):
    """mesh + quantize='int8' (round-1: unsupported) must emit the same
    tokens as a single-device int8 engine."""
    import dataclasses

    from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
    from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params
    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine
    from test_engine_e2e import MockTokenizer

    cfg = tiny_test_config()
    text = dataclasses.replace(cfg.text, vocab_size=151936)
    cfg = dataclasses.replace(
        cfg,
        thinker_config=dataclasses.replace(cfg.thinker_config,
                                           text_config=text),
    )
    enc_params = init_encoder_params(cfg.audio, dtype=jnp.float32)
    dec_params = init_decoder_params(cfg.text, dtype=jnp.float32)

    def engine(mesh):
        return AsrEngine(
            model_dir=None, dtype=jnp.float32, max_new_tokens=4,
            chunk_buckets=(2,), config=cfg,
            params=(enc_params, dec_params), tokenizer=MockTokenizer(),
            quantize="int8", mesh=mesh,
        )

    samples = (rng.standard_normal(20000) * 0.1).astype(np.float32)
    single = engine(None).transcribe_samples(samples)
    mesh = make_mesh(n_devices=8,
                     tp_divisor_of=cfg.text.num_key_value_heads)
    sharded = engine(mesh).transcribe_samples(samples)
    assert sharded.raw_output == single.raw_output


@requires_8
def test_dp_mesh_all_quant_modes_match_single_device(rng):
    """dp-only mesh (no tensor parallelism): the fused graph runs under
    shard_map — one full single-device program per shard — so EVERY
    quant mode (int4, lm8, int8 KV) composes with the mesh (round 2
    rejected them all). Tokens must match the unsharded engine."""
    import dataclasses

    from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
    from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params
    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine
    from test_engine_e2e import MockTokenizer

    cfg = tiny_test_config()
    text = dataclasses.replace(cfg.text, vocab_size=151936)
    cfg = dataclasses.replace(
        cfg,
        thinker_config=dataclasses.replace(cfg.thinker_config,
                                           text_config=text),
    )
    enc_params = init_encoder_params(cfg.audio, dtype=jnp.float32)
    dec_params = init_decoder_params(cfg.text, dtype=jnp.float32)

    def engine(mesh, **kw):
        return AsrEngine(
            model_dir=None, dtype=jnp.float32, max_new_tokens=3,
            chunk_buckets=(2,), config=cfg,
            params=(enc_params, dec_params), tokenizer=MockTokenizer(),
            mesh=mesh, **kw,
        )

    batch = [
        (rng.standard_normal(n) * 0.1).astype(np.float32)
        for n in (20000, 9000, 16000, 12000)
    ]
    dp_mesh = make_mesh(n_devices=8, tp=1)  # (dp=8, tp=1)
    assert dp_mesh.shape == {"dp": 8, "tp": 1}

    import os

    os.environ["ASR_INT4_GROUP"] = "16"  # tiny hidden dims
    try:
        for kw in ({"quantize": "int4"}, {"quantize": "int4g"},
                   {"quantize": "lm8"}, {"kv_dtype": "int8"}):
            single = engine(None, **kw).transcribe_batch(batch)
            sharded = engine(dp_mesh, **kw).transcribe_batch(batch)
            assert (
                [r.raw_output for r in sharded]
                == [r.raw_output for r in single]
            ), kw
    finally:
        os.environ.pop("ASR_INT4_GROUP", None)


@requires_8
def test_dp_mesh_single_utterance(rng):
    """A lone utterance on a dp mesh pads the batch to the shard count
    and still returns the single-device tokens."""
    import dataclasses

    from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
    from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params
    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine
    from test_engine_e2e import MockTokenizer

    cfg = tiny_test_config()
    text = dataclasses.replace(cfg.text, vocab_size=151936)
    cfg = dataclasses.replace(
        cfg,
        thinker_config=dataclasses.replace(cfg.thinker_config,
                                           text_config=text),
    )
    enc_params = init_encoder_params(cfg.audio, dtype=jnp.float32)
    dec_params = init_decoder_params(cfg.text, dtype=jnp.float32)

    def engine(mesh):
        return AsrEngine(
            model_dir=None, dtype=jnp.float32, max_new_tokens=3,
            chunk_buckets=(2,), config=cfg,
            params=(enc_params, dec_params), tokenizer=MockTokenizer(),
            mesh=mesh,
        )

    samples = (rng.standard_normal(20000) * 0.1).astype(np.float32)
    single = engine(None).transcribe_batch([samples, samples])[0]
    dp_mesh = make_mesh(n_devices=4, tp=1)
    got = engine(dp_mesh).transcribe_samples(samples)
    assert got.raw_output == single.raw_output


@requires_8
def test_tp_mesh_int4_matches_single_device(rng):
    """int4 under tensor parallelism (round 2: rejected): blocked
    per-shard nibble packing commutes with Megatron column sharding, so
    the tp engine emits the single-device int4 engine's tokens."""
    import dataclasses

    from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine
    from test_engine_e2e import MockTokenizer

    cfg = tiny_test_config()
    text = dataclasses.replace(cfg.text, vocab_size=151936)
    cfg = dataclasses.replace(
        cfg,
        thinker_config=dataclasses.replace(cfg.thinker_config,
                                           text_config=text),
    )
    enc_params = init_encoder_params(cfg.audio, dtype=jnp.float32)
    dec_params = init_decoder_params(cfg.text, dtype=jnp.float32)

    def engine(mesh):
        return AsrEngine(
            model_dir=None, dtype=jnp.float32, max_new_tokens=3,
            chunk_buckets=(2,), config=cfg,
            params=(enc_params, dec_params), tokenizer=MockTokenizer(),
            quantize="int4", mesh=mesh,
        )

    samples = (rng.standard_normal(20000) * 0.1).astype(np.float32)
    single = engine(None).transcribe_samples(samples)
    mesh = make_mesh(n_devices=8,
                     tp_divisor_of=cfg.text.num_key_value_heads)
    assert mesh.shape["tp"] == 2
    sharded = engine(mesh).transcribe_samples(samples)
    assert sharded.raw_output == single.raw_output


def _hlo_collectives_by_computation(hlo: str):
    """Map computation name -> list of collective op kinds in its body."""
    import re

    blocks, name = {}, None
    for line in hlo.splitlines():
        if not line.startswith(" ") and line.rstrip().endswith("{"):
            name = line.split("(")[0].replace("ENTRY", "").strip().lstrip("%")
            blocks[name] = []
        elif name is not None:
            for c in ("all-reduce", "all-gather", "reduce-scatter",
                      "collective-permute", "all-to-all"):
                if re.search(rf"= \S+ {c}(-start)?\(", line):
                    blocks[name].append(c)
    return blocks


def _while_body_names(hlo: str):
    import re

    return set(re.findall(r"body=%?([\w.\-]+)", hlo))


@requires_8
def test_tp_decode_collective_structure():
    """Pin the Megatron-TP program structure the perf projections assume.

    Per decoder layer exactly TWO all-reduces (row-parallel o_proj and
    down_proj psums); with layers under lax.scan they appear once in the
    while body. No reduce-scatter / all-to-all / collective-permute
    anywhere: the layout is pure column/row parallel + vocab-parallel
    lm_head (docs/PERFORMANCE.md round 3a's "~2 all-reduces/layer")."""
    from qwen3_asr_rs_tpu.models.text_decoder import KVCache

    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    dec = TextDecoder(cfg, max_position=64)
    dec.prefer_xla = True  # engine sets this under tp>1
    mesh = make_mesh(n_devices=2, tp_divisor_of=cfg.num_key_value_heads)
    assert mesh.shape["tp"] == 2
    with mesh:
        sharded = shard_params(params, mesh, decoder_param_specs())
        cache = KVCache.zeros(cfg, 1, 32, dtype=jnp.float32)
        tok = jnp.asarray([5], jnp.int32)
        fn = jax.jit(
            lambda p, t, c: dec.decode_step_token(p, t, jnp.int32(8), c)
        )
        hlo = fn.lower(sharded, tok, cache).compile().as_text()

    blocks = _hlo_collectives_by_computation(hlo)
    bodies = _while_body_names(hlo)
    scan_colls = [
        c for name, colls in blocks.items() if name in bodies for c in colls
    ]
    assert scan_colls.count("all-reduce") == 2, (
        f"expected 2 all-reduces/layer in the layer scan, got {scan_colls}"
    )
    all_colls = [c for colls in blocks.values() for c in colls]
    for kind in ("reduce-scatter", "all-to-all", "collective-permute"):
        assert kind not in all_colls, f"unexpected {kind} in tp decode"
    # outside the scan only the vocab-parallel lm_head/argmax collectives
    extra = [
        c for name, colls in blocks.items()
        if name not in bodies for c in colls
    ]
    assert len(extra) <= 3, f"unexpected extra collectives: {extra}"


@requires_8
def test_dp_fused_graph_has_no_collectives(rng):
    """The dp-only shard_map path must be collective-free: every device
    runs the full single-device program on its batch shard (engine.py
    _graph dp branch), so throughput scales linearly over ICI."""
    import dataclasses

    from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine
    from test_engine_e2e import MockTokenizer

    cfg = tiny_test_config()
    text = dataclasses.replace(cfg.text, vocab_size=151936)
    cfg = dataclasses.replace(
        cfg,
        thinker_config=dataclasses.replace(cfg.thinker_config,
                                           text_config=text),
    )
    enc_params = init_encoder_params(cfg.audio, dtype=jnp.float32)
    dec_params = init_decoder_params(cfg.text, dtype=jnp.float32)
    mesh = make_mesh(n_devices=4, dp=4)
    eng = AsrEngine(
        model_dir=None, dtype=jnp.float32, max_new_tokens=3,
        chunk_buckets=(2,), config=cfg,
        params=(enc_params, dec_params), tokenizer=MockTokenizer(),
        mesh=mesh,
    )
    from qwen3_asr_rs_tpu.features.mel import pad_waveform
    from qwen3_asr_rs_tpu.runtime.prompt import build_prompt

    cf = cfg.audio.chunk_frames
    wave, n_true = pad_waveform(
        (rng.standard_normal(20000) * 0.1).astype(np.float32),
        bucket_frames=2 * cf,
    )
    prompt = build_prompt((n_true // cf) * cfg.audio.tokens_per_chunk,
                          None, None)
    p_bucket = eng._prompt_bucket(2)
    ids = np.zeros(p_bucket, np.int32)
    ids[p_bucket - len(prompt):] = prompt
    graph = eng._graph(2, 4)
    hlo = graph.lower(
        eng.enc_params, eng.dec_params,
        jnp.asarray(np.stack([wave] * 4)),
        jnp.asarray([n_true] * 4, jnp.int32),
        jnp.asarray(np.stack([ids] * 4)),
        jnp.asarray([len(prompt)] * 4, jnp.int32),
        jnp.asarray([True, True, True, False]),
    ).compile().as_text()
    blocks = _hlo_collectives_by_computation(hlo)
    all_colls = [c for colls in blocks.values() for c in colls]
    assert all_colls == [], f"dp path must be collective-free: {all_colls}"
