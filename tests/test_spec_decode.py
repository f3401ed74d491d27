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


def _engine(max_new=16, speculative=None, spec_k=4, seed_dec=0):
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
    )


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
    """Spec engines still serve batches and sampling via the plain
    loops (spec applies to single-stream greedy only)."""
    from qwen3_asr_rs_tpu.runtime.sampling import SamplingParams

    clip = _clip(rng)
    eng = _engine(max_new=6, speculative="int8", spec_k=3)
    plain = _engine(max_new=6)
    # batch of two: plain batched loop
    a = eng.transcribe_batch([clip, clip])
    b = plain.transcribe_batch([clip, clip])
    assert [r.raw_output for r in a] == [r.raw_output for r in b]
    # sampling: plain sampling loop (greedy param -> exact argmax)
    s = eng.transcribe_samples(
        clip, sampling=SamplingParams(temperature=0.0)
    )
    assert s.raw_output == plain.transcribe_samples(clip).raw_output


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
