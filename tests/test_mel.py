"""Mel frontend tests.

Oracles:
  * transformers.audio_utils.mel_filter_bank (the exact HF filterbank the
    reference replicates, src/mel.rs:107-187)
  * a torch.stft pipeline reproducing the reference extract()
    (src/mel.rs:49-96), i.e. what the tch backend computes.
"""

import numpy as np
import pytest
import torch

from qwen3_asr_rs_tpu.features.mel import (
    LogMelFrontend,
    create_mel_filterbank,
    hann_window,
    num_mel_frames,
    pad_waveform,
)


def torch_reference_logmel(samples: np.ndarray, n_fft=400, hop=160, n_mels=128):
    """Reference math (src/mel.rs:49-96) in torch, as the tch backend runs it."""
    padded_len = -(-len(samples) // hop) * hop
    wave = torch.zeros(padded_len, dtype=torch.float32)
    wave[: len(samples)] = torch.from_numpy(np.asarray(samples, dtype=np.float32))
    pad = n_fft // 2
    wave = torch.nn.functional.pad(wave[None, None, :], (pad, pad), mode="reflect")[
        0, 0
    ]
    window = torch.hann_window(n_fft, periodic=True)
    stft = torch.stft(
        wave,
        n_fft,
        hop_length=hop,
        win_length=n_fft,
        window=window,
        center=False,
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    mags = stft.abs() ** 2
    mags = mags[:, :-1]
    filters = torch.from_numpy(create_mel_filterbank(n_mels, n_fft, 16000))
    mel = filters @ mags
    log_mel = mel.clamp_min(1e-10).log10()
    log_mel = torch.maximum(log_mel, log_mel.max() - 8.0)
    return ((log_mel + 4.0) / 4.0).numpy()


def test_filterbank_matches_transformers():
    from transformers.audio_utils import mel_filter_bank

    hf = mel_filter_bank(
        num_frequency_bins=201,
        num_mel_filters=128,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    )  # (n_freqs, n_mels)
    ours = create_mel_filterbank(128, 400, 16000)
    np.testing.assert_allclose(ours, hf.T.astype(np.float32), atol=1e-7)


def test_num_mel_frames():
    assert num_mel_frames(160) == 1
    assert num_mel_frames(161) == 2
    assert num_mel_frames(16000) == 100
    assert num_mel_frames(15999) == 100


# Note: audio shorter than n_fft (400 samples / 25 ms) cannot be reflect-
# padded; the reference's torch backend raises there too.
@pytest.mark.parametrize("n_samples", [16000, 24000, 12345, 400, 480])
def test_logmel_matches_torch_reference(rng, n_samples):
    samples = rng.standard_normal(n_samples).astype(np.float32) * 0.1
    frontend = LogMelFrontend()
    mel, n_true = frontend(samples)
    ref = torch_reference_logmel(samples)
    assert mel.shape == ref.shape == (128, n_true)
    np.testing.assert_allclose(np.asarray(mel), ref, atol=2e-5, rtol=1e-4)


def test_logmel_bucketed_padding(rng):
    samples = rng.standard_normal(20000).astype(np.float32) * 0.1
    frontend = LogMelFrontend()
    mel_exact, n_true = frontend(samples)
    mel_padded, n_true2 = frontend(samples, bucket_frames=300)
    assert n_true == n_true2 == 125
    np.testing.assert_allclose(
        np.asarray(mel_padded)[:, :n_true], np.asarray(mel_exact), atol=1e-6
    )
    # Padded frames are exactly zero (the encoder's tail-pad value).
    assert np.all(np.asarray(mel_padded)[:, n_true:] == 0.0)


def test_pad_waveform_reflect_at_true_boundary(rng):
    samples = rng.standard_normal(1000).astype(np.float32)
    wave, n_true = pad_waveform(samples, bucket_frames=20)
    assert n_true == 7
    # left reflect: wave[200 - k] == wave[200 + k]
    assert wave[199] == wave[201]
    assert wave[0] == wave[400]
    # window sanity
    w = hann_window(400)
    assert w[0] == 0.0 and abs(w[200] - 1.0) < 1e-7
