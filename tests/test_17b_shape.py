"""Smoke test at a 1.7B-like configuration (scaled down, same ratios).

Verifies the config plumbing handles the larger model family: wider
hidden, untied lm_head, sharded checkpoint on disk, forced language,
and a full engine round trip.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from qwen3_asr_rs_tpu.config import (
    AsrConfig,
    AudioEncoderConfig,
    TextDecoderConfig,
    ThinkerConfig,
)
from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params
from qwen3_asr_rs_tpu.runtime.engine import AsrEngine
from qwen3_asr_rs_tpu.weights.export import save_checkpoint
from qwen3_asr_rs_tpu.weights.loader import load_model_params

from test_engine_e2e import MockTokenizer
import pytest

pytestmark = pytest.mark.slow  # heavy parity/e2e: quick tier skips


def cfg_17b_like():
    return AsrConfig(
        ThinkerConfig(
            audio_config=AudioEncoderConfig(
                d_model=96,
                encoder_layers=2,
                encoder_attention_heads=6,
                encoder_ffn_dim=192,
                downsample_hidden_size=32,
                output_dim=128,  # == text hidden (wider than 0.6B-like)
            ),
            text_config=TextDecoderConfig(
                vocab_size=151936,
                hidden_size=128,
                intermediate_size=256,
                num_hidden_layers=3,
                num_attention_heads=8,
                num_key_value_heads=4,
                head_dim=16,
                tie_word_embeddings=False,  # 1.7B family unties lm_head
            ),
        )
    )


def test_17b_like_sharded_checkpoint_and_engine(tmp_path, rng):
    cfg = cfg_17b_like()
    enc = init_encoder_params(cfg.audio, dtype=jnp.float32)
    dec = init_decoder_params(cfg.text, dtype=jnp.float32)
    assert dec["lm_head"] is not dec["embed"]

    model_dir = tmp_path / "17b"
    # force several shards like the real 1.7B checkpoint
    save_checkpoint(model_dir, enc, dec, cfg, max_shard_bytes=20_000_000)
    assert (model_dir / "model.safetensors.index.json").exists()

    cfg2 = AsrConfig.from_file(model_dir / "config.json")
    assert cfg2.text.tie_word_embeddings is False
    enc2, dec2 = load_model_params(model_dir, cfg2, dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(dec["lm_head"]), np.asarray(dec2["lm_head"])
    )

    engine = AsrEngine(
        model_dir=None, dtype=jnp.float32, max_new_tokens=3,
        chunk_buckets=(2,), config=cfg2, params=(enc2, dec2),
        tokenizer=MockTokenizer(),
    )
    samples = (rng.standard_normal(24000) * 0.1).astype(np.float32)
    result = engine.transcribe_samples(samples, language="chinese")
    assert result.language == "forced"
