"""Audio encoder parity tests vs the torch oracle (reference math)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from qwen3_asr_rs_tpu.config import (
    AudioEncoderConfig,
    feat_extract_output_length,
    tiny_test_config,
)
from qwen3_asr_rs_tpu.models.audio_encoder import (
    AudioEncoder,
    init_encoder_params,
    sinusoid_position_embedding,
)

import torch_ref
import pytest


def _np_params(params):
    return jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), params)


def test_feat_extract_output_length():
    # (l-1)//2+1 applied three times (src/audio_encoder.rs:263-266)
    assert feat_extract_output_length(100) == 13
    assert feat_extract_output_length(1) == 1
    assert feat_extract_output_length(50) == 7
    assert feat_extract_output_length(99) == 13


def test_sinusoid_table_matches_reference():
    ours = sinusoid_position_embedding(32, 64)
    ref = torch_ref.sinusoid_table(32, 64).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def _run_parity(num_frames, rng, bucket_chunks=None):
    cfg = tiny_test_config().audio
    params = init_encoder_params(cfg, dtype=jnp.float32)
    enc = AudioEncoder(cfg)

    mel = rng.standard_normal((cfg.num_mel_bins, num_frames)).astype(np.float32)

    cf = cfg.chunk_frames
    n_chunks = -(-num_frames // cf)
    if bucket_chunks is None:
        bucket_chunks = n_chunks
    mel_padded = np.zeros((cfg.num_mel_bins, bucket_chunks * cf), np.float32)
    mel_padded[:, :num_frames] = mel

    flat, n_valid = enc(params, jnp.asarray(mel_padded), jnp.int32(num_frames))
    n_valid = int(n_valid)

    tref = torch_ref.TorchAudioEncoder(cfg, _np_params(params))
    ref = tref.forward(torch.from_numpy(mel)).numpy()

    assert n_valid == ref.shape[0]
    got = np.asarray(flat)[:n_valid]
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-3)


@pytest.mark.slow
def test_encoder_short_full_attention(rng):
    # 3 chunks < chunks_per_window -> reference uses full attention
    _run_parity(300, rng)


def test_encoder_partial_tail_chunk(rng):
    _run_parity(260, rng)  # tail chunk of 60 frames


@pytest.mark.slow
def test_encoder_windowed(rng):
    # > chunks_per_window (8) chunks -> block-diagonal windows
    _run_parity(1000, rng)


@pytest.mark.slow
def test_encoder_windowed_ragged_tail(rng):
    # 10.4 chunks: window 2 is partial (2 full chunks + tail)
    _run_parity(1040, rng)


@pytest.mark.slow
def test_encoder_bucket_padding_invariance(rng):
    # same audio, larger bucket -> identical valid outputs
    cfg = tiny_test_config().audio
    params = init_encoder_params(cfg, dtype=jnp.float32)
    enc = AudioEncoder(cfg)
    num_frames = 260
    mel = rng.standard_normal((cfg.num_mel_bins, num_frames)).astype(np.float32)

    def run(bucket_chunks):
        cf = cfg.chunk_frames
        mp = np.zeros((cfg.num_mel_bins, bucket_chunks * cf), np.float32)
        mp[:, :num_frames] = mel
        flat, n_valid = enc(params, jnp.asarray(mp), jnp.int32(num_frames))
        return np.asarray(flat)[: int(n_valid)]

    a = run(3)
    b = run(16)
    # bucket 3 -> full attention over 3 chunks; bucket 16 -> window of 8
    # chunks with only 3 valid -> same effective attention span.
    np.testing.assert_allclose(a, b, atol=3e-5, rtol=1e-4)


def test_valid_tokens_formula():
    cfg = AudioEncoderConfig()
    enc = AudioEncoder(cfg)
    for frames in [100, 260, 1000, 1040, 37, 99]:
        expected = (frames // 100) * 13
        tail = frames % 100
        if tail:
            expected += feat_extract_output_length(tail)
        assert int(enc.valid_tokens(jnp.int32(frames))) == expected
