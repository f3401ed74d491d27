"""Speculative decoding: bit-exact greedy parity at any draft quality.

The contract under test: an engine constructed with ``speculative=``
emits EXACTLY the tokens the plain greedy engine emits — acceptance only
changes speed. Covers high-acceptance (self-draft), quantized drafts,
an adversarial (wrong-weights) draft, EOS inside the verify window, the
max_new cap, and decode-segment slab growth.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_rs_tpu.config import tiny_test_config
from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params
from qwen3_asr_rs_tpu.runtime.engine import AsrEngine

from test_engine_e2e import MockTokenizer

pytestmark = pytest.mark.slow  # heavy parity/e2e: quick tier skips


def _cfg():
    cfg = tiny_test_config()
    text = dataclasses.replace(cfg.text, vocab_size=151936)
    return dataclasses.replace(
        cfg, thinker_config=dataclasses.replace(
            cfg.thinker_config, text_config=text)
    )


def _engine(max_new=16, speculative=None, spec_k=4, seed_dec=0,
            draft_model=None):
    cfg = _cfg()
    enc_params = init_encoder_params(cfg.audio, dtype=jnp.float32)
    dec_params = init_decoder_params(cfg.text, dtype=jnp.float32,
                                     seed=seed_dec)
    return AsrEngine(
        model_dir=None,
        dtype=jnp.float32,
        max_new_tokens=max_new,
        chunk_buckets=(2, 4),
        config=cfg,
        params=(enc_params, dec_params),
        tokenizer=MockTokenizer(),
        speculative=speculative,
        spec_k=spec_k,
        draft_model=draft_model,
    )


def _draft_cfg(vocab=151936, n_window=None):
    """A SMALLER model than _cfg() — the cross-model draft: fewer/narrower
    layers, its own audio tower width. Shares vocab + chunk geometry with
    the target (the engine validates exactly that)."""
    cfg = tiny_test_config()
    kw = {} if n_window is None else {"n_window": n_window}
    audio = dataclasses.replace(
        cfg.audio, d_model=32, encoder_layers=1,
        encoder_attention_heads=2, encoder_ffn_dim=64,
        downsample_hidden_size=16, output_dim=48, **kw,
    )
    text = dataclasses.replace(
        cfg.text, vocab_size=vocab, hidden_size=48, intermediate_size=96,
        num_hidden_layers=1, num_attention_heads=3,
        num_key_value_heads=1, head_dim=16,
    )
    return dataclasses.replace(cfg, thinker_config=dataclasses.replace(
        cfg.thinker_config, audio_config=audio, text_config=text))


def _draft_tuple(dcfg, seed=7):
    return (dcfg, (init_encoder_params(dcfg.audio, dtype=jnp.float32),
                   init_decoder_params(dcfg.text, dtype=jnp.float32,
                                       seed=seed)))


def _clip(rng, seconds=2):
    return (rng.standard_normal(16000 * seconds) * 0.1).astype(np.float32)


@pytest.mark.parametrize("spec_mode,k", [
    ("bf16", 4),   # self-draft: acceptance 1.0, pure machinery check
    ("int8", 3),   # realistic quantized draft
    ("int4", 2),   # low-agreement draft on synthetic weights
])
def test_spec_matches_plain_greedy(rng, spec_mode, k):
    clip = _clip(rng)
    plain = _engine(max_new=16).transcribe_samples(clip)
    spec_eng = _engine(max_new=16, speculative=spec_mode, spec_k=k)
    spec = spec_eng.transcribe_samples(clip)
    assert spec.raw_output == plain.raw_output
    stats = spec_eng.last_spec_stats
    assert stats is not None and stats["iterations"] >= 1
    assert stats["tokens"] == 16 or stats["tokens"] < 16  # cap respected
    if spec_mode == "bf16":
        # self-draft accepts every draft: k+1 tokens per iteration
        assert stats["mean_accepted"] == pytest.approx(
            min(k, stats["tokens"] / stats["iterations"] - 1), abs=1e-9
        ) or stats["mean_accepted"] >= k - 1


def test_spec_adversarial_draft_still_exact(rng):
    """A draft with the WRONG weights must not change a single token."""
    clip = _clip(rng)
    plain = _engine(max_new=12).transcribe_samples(clip)
    eng = _engine(max_new=12, speculative="bf16", spec_k=4)
    # swap in a decoder from a different seed: near-zero acceptance
    eng.draft_params = init_decoder_params(
        _cfg().text, dtype=jnp.float32, seed=99
    )
    out = eng.transcribe_samples(clip)
    assert out.raw_output == plain.raw_output
    stats = eng.last_spec_stats
    # wrong-draft acceptance collapses: close to one token per iteration
    assert stats["tokens"] >= stats["iterations"]


def test_spec_eos_inside_window(rng, monkeypatch):
    """EOS appearing mid-verify-window stops emission exactly where the
    sequential loop would."""
    import qwen3_asr_rs_tpu.runtime.engine as eng_mod

    clip = _clip(rng)
    base = _engine(max_new=12).transcribe_samples(clip)
    toks = [int(t) for t in base.raw_output.split()]
    assert len(toks) >= 4
    # pick an EOS id equal to some generated token but NOT to any token
    # before it, so the expected stop point is unambiguous (random
    # weights often repeat one token, so toks[2] may equal toks[0])
    cut = next(
        (i for i in range(1, len(toks)) if toks[i] not in toks[:i]),
        None,
    )
    if cut is None:  # fully degenerate repetition: EOS at the start
        cut = 0
    monkeypatch.setattr(eng_mod, "ENDOFTEXT_TOKEN_ID", toks[cut])
    plain = _engine(max_new=12).transcribe_samples(clip)
    assert [int(t) for t in plain.raw_output.split()] == toks[:cut]
    spec_eng = _engine(max_new=12, speculative="bf16", spec_k=4)
    spec = spec_eng.transcribe_samples(clip)
    assert spec.raw_output == plain.raw_output


def test_spec_max_new_cap(rng):
    clip = _clip(rng)
    for cap in (1, 2, 5):
        plain = _engine(max_new=cap).transcribe_samples(clip)
        spec = _engine(
            max_new=cap, speculative="bf16", spec_k=3
        ).transcribe_samples(clip)
        assert spec.raw_output == plain.raw_output
        assert len(spec.raw_output.split()) <= cap


def test_spec_segmented_slab_growth(rng, monkeypatch):
    """Spec decode must agree with plain greedy across decode-segment
    slab boundaries (small first slab forces mid-decode growth)."""
    monkeypatch.setenv("ASR_DECODE_SEGMENT", "2")
    clip = _clip(rng)
    plain = _engine(max_new=14).transcribe_samples(clip)
    spec = _engine(
        max_new=14, speculative="int8", spec_k=3
    ).transcribe_samples(clip)
    assert spec.raw_output == plain.raw_output


def test_spec_batch_and_sampling_fall_back(rng):
    """Spec engines still serve batches via the plain loop (spec is
    single-stream only), and temperature=0 params stay exact greedy."""
    from qwen3_asr_rs_tpu.runtime.sampling import SamplingParams

    clip = _clip(rng)
    eng = _engine(max_new=6, speculative="int8", spec_k=3)
    plain = _engine(max_new=6)
    # batch of two: plain batched loop
    a = eng.transcribe_batch([clip, clip])
    b = plain.transcribe_batch([clip, clip])
    assert [r.raw_output for r in a] == [r.raw_output for r in b]
    # temperature 0 params: greedy path (spec greedy loop, exact argmax)
    s = eng.transcribe_samples(
        clip, sampling=SamplingParams(temperature=0.0)
    )
    assert s.raw_output == plain.transcribe_samples(clip).raw_output


def test_spec_sampling_topk1_is_bitwise_greedy(rng):
    """Speculative SAMPLING with top_k=1 degenerates to exact greedy
    (one-hot p and q), for quantized AND cross-model drafts — a bitwise
    pin on the accept/residual plumbing."""
    from qwen3_asr_rs_tpu.runtime.sampling import SamplingParams

    clip = _clip(rng)
    plain = _engine(max_new=12).transcribe_samples(clip)
    sp = SamplingParams(temperature=0.9, top_k=1, seed=3)
    for kw in (
        dict(speculative="int8", spec_k=3),
        dict(draft_model=_draft_tuple(_draft_cfg()), spec_k=2),
    ):
        eng = _engine(max_new=12, **kw)
        out = eng.transcribe_samples(clip, sampling=sp)
        assert out.raw_output == plain.raw_output
        assert eng.last_spec_stats["iterations"] >= 1


def test_spec_sampling_deterministic_and_capped(rng):
    from qwen3_asr_rs_tpu.runtime.sampling import SamplingParams

    clip = _clip(rng)
    eng = _engine(max_new=9, speculative="int8", spec_k=3)
    sp = SamplingParams(temperature=0.8, seed=11)
    a = eng.transcribe_samples(clip, sampling=sp)
    b = eng.transcribe_samples(clip, sampling=sp)
    assert a.raw_output == b.raw_output
    assert len(a.raw_output.split()) <= 9
    # a different seed decodes a different trajectory (random weights:
    # astronomically unlikely to coincide for 9 tokens of vocab 152k)
    c = eng.transcribe_samples(
        clip, sampling=SamplingParams(temperature=0.8, seed=12)
    )
    assert c.raw_output != a.raw_output


def test_spec_sampling_self_draft_accepts_everything(rng):
    """Self-draft q == p: min(1, p/q) = 1, every draft accepted — the
    machinery check that filtered_probs matches sample_token exactly."""
    from qwen3_asr_rs_tpu.runtime.sampling import SamplingParams

    clip = _clip(rng)
    eng = _engine(max_new=12, speculative="bf16", spec_k=4)
    out = eng.transcribe_samples(
        clip, sampling=SamplingParams(temperature=0.7, seed=5)
    )
    st = eng.last_spec_stats
    assert st is not None
    # every iteration emits accepted drafts + 1 (cap may clamp the last)
    assert st["tokens"] == 12 or st["mean_accepted"] >= 4 - 1e-6
    assert st["mean_accepted"] >= 3.0
    assert len(out.raw_output.split()) <= 12


def test_cross_model_draft_bit_identical(rng):
    """A genuinely different (smaller) draft model must not change a
    single output token — it has its own encoder, embed table, hidden
    width, and KV slab, so near-zero acceptance on random weights."""
    clip = _clip(rng)
    plain = _engine(max_new=14).transcribe_samples(clip)
    eng = _engine(max_new=14, spec_k=3,
                  draft_model=_draft_tuple(_draft_cfg()))
    out = eng.transcribe_samples(clip)
    assert out.raw_output == plain.raw_output
    stats = eng.last_spec_stats
    assert stats is not None and stats["iterations"] >= 1
    assert stats["tokens"] >= stats["iterations"]


def test_cross_model_draft_quantized(rng):
    """speculative= names the DRAFT's quantization when draft_model is
    given (e.g. an int8 0.6B draft under a bf16 1.7B target)."""
    clip = _clip(rng)
    plain = _engine(max_new=10).transcribe_samples(clip)
    eng = _engine(max_new=10, speculative="int8", spec_k=2,
                  draft_model=_draft_tuple(_draft_cfg()))
    assert eng.transcribe_samples(clip).raw_output == plain.raw_output
    # the draft decoder params carry quantized leaves
    import jax

    dtypes = {a.dtype.name for a in
              jax.tree_util.tree_leaves(eng.draft_bundle.dec_params)
              if hasattr(a, "dtype")}
    assert "int8" in dtypes


def test_cross_model_draft_slab_growth(rng, monkeypatch):
    """Both slabs (different layer/head shapes) must grow across decode
    segments without desynchronizing."""
    monkeypatch.setenv("ASR_DECODE_SEGMENT", "2")
    clip = _clip(rng)
    plain = _engine(max_new=12).transcribe_samples(clip)
    eng = _engine(max_new=12, spec_k=3,
                  draft_model=_draft_tuple(_draft_cfg()))
    assert eng.transcribe_samples(clip).raw_output == plain.raw_output


def test_cross_model_draft_with_quantized_target(rng):
    """draft_model composes with a QUANTIZED target (quantize=): the
    verify runs at the target's serving precision and output matches
    the plain quantized engine exactly."""
    clip = _clip(rng)
    cfg = _cfg()
    enc_params = init_encoder_params(cfg.audio, dtype=jnp.float32)
    dec_params = init_decoder_params(cfg.text, dtype=jnp.float32)

    def eng(**kw):
        return AsrEngine(
            model_dir=None, dtype=jnp.float32, max_new_tokens=10,
            chunk_buckets=(2, 4), config=cfg,
            params=(enc_params, dec_params), tokenizer=MockTokenizer(),
            **kw,
        )

    plain_q = eng(quantize="int8").transcribe_samples(clip)
    spec_q = eng(
        quantize="int8", spec_k=2,
        draft_model=_draft_tuple(_draft_cfg()),
    ).transcribe_samples(clip)
    assert spec_q.raw_output == plain_q.raw_output


def test_cross_model_draft_validation():
    with pytest.raises(ValueError, match="vocab_size"):
        _engine(draft_model=_draft_tuple(_draft_cfg(vocab=1024)))
    with pytest.raises(ValueError, match="audio-token layout"):
        _engine(draft_model=_draft_tuple(_draft_cfg(n_window=25)))
    from qwen3_asr_rs_tpu.parallel.mesh import make_mesh

    cfg = _cfg()
    with pytest.raises(ValueError, match="mesh"):
        AsrEngine(
            model_dir=None, dtype=jnp.float32, config=cfg,
            params=(init_encoder_params(cfg.audio, dtype=jnp.float32),
                    init_decoder_params(cfg.text, dtype=jnp.float32)),
            tokenizer=MockTokenizer(),
            draft_model=_draft_tuple(_draft_cfg()),
            mesh=make_mesh(dp=2),
        )


def test_spec_rejects_mesh():
    from qwen3_asr_rs_tpu.parallel.mesh import make_mesh

    cfg = _cfg()
    with pytest.raises(ValueError):
        AsrEngine(
            model_dir=None,
            dtype=jnp.float32,
            config=cfg,
            params=(init_encoder_params(cfg.audio, dtype=jnp.float32),
                    init_decoder_params(cfg.text, dtype=jnp.float32)),
            tokenizer=MockTokenizer(),
            speculative="int8",
            mesh=make_mesh(dp=2),
        )


def test_spec_invalid_modes():
    cfg = _cfg()
    params = (init_encoder_params(cfg.audio, dtype=jnp.float32),
              init_decoder_params(cfg.text, dtype=jnp.float32))
    with pytest.raises(ValueError):
        AsrEngine(model_dir=None, config=cfg, params=params,
                  tokenizer=MockTokenizer(), speculative="fp8")
    with pytest.raises(ValueError):
        AsrEngine(model_dir=None, config=cfg, params=params,
                  tokenizer=MockTokenizer(), speculative="int8",
                  spec_k=0)


def test_cli_draft_flag(tmp_path, capsys, monkeypatch):
    """CLI --draft produces the same stdout contract (and text) as the
    plain invocation."""
    from test_reference_fixtures import FIXTURES

    model_dir = tmp_path / "model"
    from qwen3_asr_rs_tpu.weights.export import save_checkpoint
    from test_weights_roundtrip import write_word_tokenizer

    cfg = _cfg()
    save_checkpoint(
        model_dir,
        init_encoder_params(cfg.audio, dtype=jnp.float32),
        init_decoder_params(cfg.text, dtype=jnp.float32),
        cfg,
    )
    write_word_tokenizer(model_dir)
    monkeypatch.setenv("ASR_MAX_NEW_TOKENS", "4")
    monkeypatch.setenv("ASR_DTYPE", "float32")
    from qwen3_asr_rs_tpu.cli import main

    rc = main([str(model_dir), str(FIXTURES[0])])
    assert rc == 0
    plain_out = capsys.readouterr().out
    rc = main([str(model_dir), str(FIXTURES[0]), "--draft", "int8",
               "--draft-k", "3"])
    assert rc == 0
    assert capsys.readouterr().out == plain_out
    # invalid mode: clean error
    rc = main([str(model_dir), str(FIXTURES[0]), "--draft", "fp8"])
    assert rc == 1
    assert "unknown --draft mode" in capsys.readouterr().err

    # cross-model draft from a second checkpoint dir: same stdout
    dcfg = _draft_cfg()
    draft_dir = tmp_path / "draft"
    save_checkpoint(
        draft_dir,
        init_encoder_params(dcfg.audio, dtype=jnp.float32),
        init_decoder_params(dcfg.text, dtype=jnp.float32, seed=7),
        dcfg,
    )
    rc = main([str(model_dir), str(FIXTURES[0]),
               "--draft-model", str(draft_dir), "--draft-k", "2"])
    assert rc == 0
    assert capsys.readouterr().out == plain_out
    # quantized cross-model draft composes
    rc = main([str(model_dir), str(FIXTURES[0]),
               "--draft-model", str(draft_dir), "--draft", "int8"])
    assert rc == 0
    assert capsys.readouterr().out == plain_out
    # missing draft dir: clean error
    rc = main([str(model_dir), str(FIXTURES[0]),
               "--draft-model", str(tmp_path / "nope")])
    assert rc == 1
    assert "draft model directory not found" in capsys.readouterr().err
