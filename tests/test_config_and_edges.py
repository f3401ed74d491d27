"""Config plumbing and edge-case coverage."""

import dataclasses
import json

import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_rs_tpu.config import (
    AsrConfig,
    AudioEncoderConfig,
    TextDecoderConfig,
    feat_extract_output_length,
    tiny_test_config,
)
from qwen3_asr_rs_tpu.errors import WeightsError
from qwen3_asr_rs_tpu.runtime.prompt import parse_asr_output


def test_config_defaults_match_reference():
    # serde defaults from src/config.rs:52-113
    a = AudioEncoderConfig()
    assert (a.d_model, a.encoder_layers, a.encoder_attention_heads) == (
        896, 18, 14,
    )
    assert (a.n_window, a.n_window_infer, a.conv_chunksize) == (50, 800, 500)
    assert (a.downsample_hidden_size, a.output_dim) == (480, 1024)
    t = TextDecoderConfig()
    assert (t.vocab_size, t.hidden_size, t.num_hidden_layers) == (
        151936, 1024, 28,
    )
    assert (t.num_attention_heads, t.num_key_value_heads, t.head_dim) == (
        16, 8, 128,
    )
    assert t.rope_theta == 1_000_000.0
    assert t.mrope_section() == (24, 20, 20)
    assert t.mrope_interleaved() is False


def test_config_from_partial_json(tmp_path):
    # missing keys fall back to defaults; unknown keys are ignored
    raw = {
        "thinker_config": {
            "audio_config": {"encoder_layers": 6, "mystery_key": 1},
            "text_config": {
                "hidden_size": 2048,
                "rope_scaling": {
                    "rope_type": "mrope",
                    "mrope_section": [8, 4, 4],
                    "mrope_interleaved": True,
                },
            },
        },
        "other_top_level": {},
    }
    p = tmp_path / "config.json"
    p.write_text(json.dumps(raw))
    cfg = AsrConfig.from_file(p)
    assert cfg.audio.encoder_layers == 6
    assert cfg.audio.d_model == 896  # default preserved
    assert cfg.text.hidden_size == 2048
    assert cfg.text.mrope_section() == (8, 4, 4)
    assert cfg.text.mrope_interleaved() is True


@pytest.mark.slow
def test_interleaved_mrope_model_forward(rng):
    """Decoder forward with an interleaved MRoPE config matches torch."""
    import torch_ref
    from qwen3_asr_rs_tpu.models.text_decoder import (
        TextDecoder, init_decoder_params,
    )
    from qwen3_asr_rs_tpu.config import RopeScaling
    import jax

    base = tiny_test_config().text
    cfg = dataclasses.replace(
        base,
        rope_scaling=RopeScaling(
            rope_type="mrope", mrope_section=(4, 2, 2),
            mrope_interleaved=True,
        ),
    )
    assert cfg.mrope_interleaved()
    params = init_decoder_params(cfg, dtype=jnp.float32)
    dec = TextDecoder(cfg, max_position=64)
    ids = np.array([[3, 17, 200, 5]], np.int32)
    hidden = dec.embed(params, jnp.asarray(ids))
    # distinct position rows exercise the interleaved dim map
    pos = np.stack([np.arange(4), np.arange(4) + 2, np.arange(4) * 3])
    logits = dec.forward_full(params, hidden, jnp.asarray(pos))

    tref = torch_ref.TorchTextDecoder(
        cfg, jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32),
                                    params)
    )
    cos, sin = torch_ref.mrope_cos_sin(
        pos.tolist(), cfg.head_dim, cfg.rope_theta,
        list(cfg.mrope_section()), True,
    )
    ref = tref.forward(
        tref.embed(ids[0])[None], cos, sin,
        [None] * cfg.num_hidden_layers, torch_ref.causal_mask(4, 0),
    )
    np.testing.assert_allclose(
        np.asarray(logits), ref.numpy(), atol=2e-4, rtol=1e-3
    )


@pytest.mark.slow
def test_bucket_picker():
    from test_engine_e2e import make_engine

    eng, *_ = make_engine()
    assert eng._pick_bucket(150) == 2   # 1.5 chunks -> bucket 2
    assert eng._pick_bucket(200) == 2
    assert eng._pick_bucket(201) == 4
    with pytest.raises(ValueError):
        eng._pick_bucket(10_000)  # beyond largest bucket (8)


def test_loader_missing_weight_error(tmp_path):
    from safetensors.flax import save_file
    from qwen3_asr_rs_tpu.weights.loader import load_model_params

    cfg = tiny_test_config()
    save_file(
        {"thinker.audio_tower.conv2d1.weight": jnp.zeros((2, 1, 3, 3))},
        str(tmp_path / "model.safetensors"),
    )
    with pytest.raises(WeightsError):
        load_model_params(tmp_path, cfg)


def test_parse_output_fallback_boundary():
    # no <asr_text> marker: split at the first non-alphabetic char
    lang, text = parse_asr_output("language English: hello there", False)
    assert lang == "English"
    assert text == ": hello there"
    # trailing language only
    lang, text = parse_asr_output("language Chinese", False)
    assert lang == "Chinese"
    assert text == ""


def test_feat_extract_matches_conv_arithmetic():
    # ((l-1)//2+1)^3 equals the actual conv stem output length
    from qwen3_asr_rs_tpu.models.audio_encoder import conv_stem_output_time

    for frames in (100, 50, 99, 37):
        assert feat_extract_output_length(frames) <= conv_stem_output_time(
            max(frames, 100)
        )
    assert feat_extract_output_length(100) == conv_stem_output_time(100)


def test_cli_language_flag_parsing(tmp_path, capsys):
    """--language works anywhere; positional language only in the exact
    reference shape; a 3rd arg naming an existing FILE joins the batch
    (with a warning) instead of silently flipping to a language."""
    from qwen3_asr_rs_tpu.cli import main

    # missing --language value
    rc = main([str(tmp_path), "a.wav", "--language"])
    assert rc == 1
    assert "--language needs a value" in capsys.readouterr().err

    # nonexistent audio with explicit --language: audio-not-found error,
    # NOT language misparse
    rc = main([str(tmp_path), str(tmp_path / "no.wav"), "-l", "chinese"])
    assert rc == 1
    assert "Audio file not found" in capsys.readouterr().err

    # positional language (reference shape): second trailing arg is not
    # a file -> treated as language -> engine load proceeds and fails on
    # the model dir, not on an audio lookup
    wav = tmp_path / "x.wav"
    wav.write_bytes(b"RIFF\0\0\0\0WAVE")
    rc = main([str(tmp_path / "nomodel"), str(wav), "english"])
    assert rc == 1
    assert "Model directory not found" in capsys.readouterr().err
