"""Loader <-> exporter round-trip and CLI end-to-end on a synthetic model."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_rs_tpu.config import AsrConfig, tiny_test_config
from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params
from qwen3_asr_rs_tpu.weights.export import save_checkpoint
from qwen3_asr_rs_tpu.weights.loader import load_model_params


def _tiny_cfg_real_vocab():
    cfg = tiny_test_config()
    text = dataclasses.replace(cfg.text, vocab_size=151936)
    return dataclasses.replace(
        cfg,
        thinker_config=dataclasses.replace(cfg.thinker_config,
                                           text_config=text),
    )


def _assert_tree_equal(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(fa) == len(fb)
    for path, leaf in fa:
        np.testing.assert_array_equal(
            np.asarray(leaf, np.float32), np.asarray(fb[path], np.float32),
            err_msg=str(path),
        )


@pytest.mark.parametrize("sharded", [False, True])
def test_checkpoint_roundtrip(tmp_path, sharded):
    cfg = tiny_test_config()
    enc = init_encoder_params(cfg.audio, dtype=jnp.float32)
    dec = init_decoder_params(cfg.text, dtype=jnp.float32)
    save_checkpoint(
        tmp_path, enc, dec, cfg,
        max_shard_bytes=200_000 if sharded else None,
    )
    if sharded:
        assert (tmp_path / "model.safetensors.index.json").exists()
        import glob

        assert len(glob.glob(str(tmp_path / "model-*.safetensors"))) > 1

    cfg2 = AsrConfig.from_file(tmp_path / "config.json")
    assert cfg2 == cfg
    enc2, dec2 = load_model_params(tmp_path, cfg2, dtype=jnp.float32)
    _assert_tree_equal(enc, enc2)
    _assert_tree_equal(dec, dec2)


def write_word_tokenizer(model_dir):
    """Minimal valid HF tokenizer.json (WordLevel over a few words)."""
    vocab = {
        "language": 11, "English": 12, "Chinese": 13, "hello": 14,
        "world": 15, "<unk>": 0,
    }
    tok = {
        "version": "1.0",
        "truncation": None,
        "padding": None,
        "added_tokens": [],
        "normalizer": None,
        "pre_tokenizer": {"type": "Whitespace"},
        "post_processor": None,
        "decoder": None,
        "model": {"type": "WordLevel", "vocab": vocab, "unk_token": "<unk>"},
    }
    with open(model_dir / "tokenizer.json", "w") as f:
        json.dump(tok, f)


@pytest.mark.slow
def test_cli_end_to_end(tmp_path, capsys, rng):
    """Full CLI path: synthetic checkpoint on disk -> `asr model audio`."""
    cfg = _tiny_cfg_real_vocab()
    enc = init_encoder_params(cfg.audio, dtype=jnp.float32)
    dec = init_decoder_params(cfg.text, dtype=jnp.float32)
    model_dir = tmp_path / "model"
    save_checkpoint(model_dir, enc, dec, cfg)
    write_word_tokenizer(model_dir)

    # a 0.7 s WAV at 24 kHz (exercises the resample path like the
    # reference's CI fixtures)
    from test_audio_io import write_wav_pcm16

    wav = tmp_path / "a.wav"
    write_wav_pcm16(wav, rng.standard_normal(16800) * 0.1, 24000)

    import os

    os.environ["ASR_MAX_NEW_TOKENS"] = "4"
    os.environ["ASR_DTYPE"] = "float32"
    try:
        from qwen3_asr_rs_tpu.cli import main

        rc = main([str(model_dir), str(wav)])
    finally:
        del os.environ["ASR_MAX_NEW_TOKENS"]
        del os.environ["ASR_DTYPE"]
    assert rc == 0
    out = capsys.readouterr().out
    lines = out.strip().split("\n")
    assert lines[0].startswith("Language:")
    assert lines[1].startswith("Text:")


def test_cli_usage_and_missing_paths(capsys):
    from qwen3_asr_rs_tpu.cli import main

    assert main([]) == 1
    assert "Usage" in capsys.readouterr().err
    assert main(["/nonexistent", "/nonexistent.wav"]) == 1
