"""Whisper-style log-mel frontend, TPU-native.

Numerically matches the reference pipeline (reference: src/mel.rs:49-96):

1. zero-pad samples to the next multiple of ``hop_length``
2. reflect-pad ``n_fft // 2`` samples on each side
3. STFT: Hann window, ``n_fft=400``, ``hop=160`` (no further centering)
4. power spectrogram ``|STFT|^2``, drop the last frame
5. Slaney 128-bin mel filterbank matmul
6. ``log10(clamp_min(1e-10))``, floor at ``global_max - 8``, then ``(x+4)/4``

The filterbank is constructed once on the host in float64
(reference: src/mel.rs:115-187) and kept as a constant; the per-utterance
compute is a single jit graph: framing gather -> rFFT -> matmul -> log ops.

Unlike the reference, the extractor supports *bucketed* padded inputs so the
same compiled graph serves many audio lengths: the caller passes the true
frame count and padded frames are forced to exactly 0.0 (the same value the
reference encoder uses when zero-padding tail chunks,
reference: src/audio_encoder.rs:105-121).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, log above (src/mel.rs:131-137)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        f < min_log_hz,
        f / f_sp,
        min_log_mel + np.log(np.maximum(f, 1e-30) / min_log_hz) / logstep,
    )


def mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    """Inverse Slaney mel scale (src/mel.rs:139-145)."""
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        m < min_log_mel,
        f_sp * m,
        min_log_hz * np.exp(logstep * (m - min_log_mel)),
    )


def create_mel_filterbank(
    num_mels: int = 128,
    n_fft: int = 400,
    sample_rate: int = 16000,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """Triangular Slaney-normalized mel filterbank, shape (num_mels, n_fft//2+1).

    Slopes-based construction identical to HF/librosa and the reference
    (src/mel.rs:115-187): filter edges equally spaced on the Slaney mel
    scale, triangular responses min(up, down), then 2/(f_hi - f_lo)
    normalization. All math in float64, output float32.
    """
    if fmax is None:
        fmax = sample_rate / 2.0
    n_freqs = n_fft // 2 + 1

    mel_min = hz_to_mel_slaney(np.array(fmin))
    mel_max = hz_to_mel_slaney(np.array(fmax))
    mel_pts = mel_min + (mel_max - mel_min) * np.arange(num_mels + 2) / (num_mels + 1)
    filter_freqs = mel_to_hz_slaney(mel_pts)  # (num_mels + 2,)

    all_freqs = np.arange(n_freqs, dtype=np.float64) * sample_rate / n_fft
    f_diff = np.diff(filter_freqs)  # (num_mels + 1,)

    # down[i, j] = (freq_j - edge_i) / (edge_{i+1} - edge_i)
    down = (all_freqs[None, :] - filter_freqs[:-2, None]) / f_diff[:-1, None]
    up = (filter_freqs[2:, None] - all_freqs[None, :]) / f_diff[1:, None]
    filters = np.maximum(0.0, np.minimum(down, up))

    enorm = 2.0 / (filter_freqs[2:] - filter_freqs[:-2])
    filters = filters * enorm[:, None]
    return filters.astype(np.float32)


def hann_window(n_fft: int) -> np.ndarray:
    """Periodic Hann window (matches torch.hann_window default)."""
    return (
        0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft, dtype=np.float64) / n_fft))
    ).astype(np.float32)


def dft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT as two matmul constants: cos and -sin, (n_fft, n_fft//2+1).

    XLA's FFT lowering is slow on TPU; the power spectrum only needs
    |DFT|^2 = (x @ C)^2 + (x @ S)^2, which the MXU computes an order of
    magnitude faster than the rFFT op at Whisper's n_fft=400. Built in
    float64 and stored f32.
    """
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_freqs, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def num_mel_frames(num_samples: int, hop_length: int = 160) -> int:
    """Mel frame count for a raw sample count.

    The reference pads samples to a hop multiple, center-pads, STFTs and
    drops the last frame (src/mel.rs:51-84), which works out to
    ceil(num_samples / hop).
    """
    return -(-num_samples // hop_length)


def pad_waveform(samples: np.ndarray, n_fft: int = 400, hop_length: int = 160,
                 bucket_frames: int | None = None) -> tuple[np.ndarray, int]:
    """Host-side waveform prep: hop-multiple zero pad + reflect pad.

    Returns ``(padded, n_true_frames)`` where ``padded`` has length
    ``bucket_frames * hop + 2 * (n_fft // 2)``. The reflect padding is
    applied at the *true* boundary (before any bucket padding) so bucketed
    frames match the reference's unbucketed frames exactly.
    """
    samples = np.asarray(samples, dtype=np.float32).reshape(-1)
    n_true_frames = num_mel_frames(len(samples), hop_length)
    hop_len = n_true_frames * hop_length
    wave = np.zeros(hop_len, dtype=np.float32)
    wave[: len(samples)] = samples
    pad = n_fft // 2
    wave = np.pad(wave, (pad, pad), mode="reflect")
    if bucket_frames is not None:
        if bucket_frames < n_true_frames:
            raise ValueError(
                f"bucket_frames={bucket_frames} < true frames {n_true_frames}"
            )
        total = bucket_frames * hop_length + 2 * pad
        wave = np.pad(wave, (0, total - len(wave)))
    return wave, n_true_frames


class LogMelFrontend:
    """Jit-compiled log-mel extractor over bucketed waveforms."""

    def __init__(
        self,
        n_fft: int = 400,
        hop_length: int = 160,
        num_mel_bins: int = 128,
        sample_rate: int = 16000,
    ):
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.num_mel_bins = num_mel_bins
        self.sample_rate = sample_rate
        self.mel_filters = jnp.asarray(
            create_mel_filterbank(num_mel_bins, n_fft, sample_rate)
        )
        self.window = jnp.asarray(hann_window(n_fft))
        cos_m, sin_m = dft_matrices(n_fft)
        self.dft_cos = jnp.asarray(cos_m)
        self.dft_sin = jnp.asarray(sin_m)

    def __call__(self, samples: np.ndarray, bucket_frames: int | None = None):
        """Extract log-mel features.

        Args:
          samples: 1-D float32 PCM at ``sample_rate``.
          bucket_frames: pad the output to this many frames (static shape);
            defaults to the exact frame count.

        Returns:
          ``(mel, n_true_frames)`` with ``mel`` of shape
          ``(num_mel_bins, bucket_frames)`` float32; frames at index >=
          ``n_true_frames`` are exactly 0.0.
        """
        n_true = num_mel_frames(len(samples), self.hop_length)
        if bucket_frames is None:
            bucket_frames = n_true
        wave, n_true = pad_waveform(samples, self.n_fft, self.hop_length,
                                    bucket_frames)
        mel = _extract_jit(
            jnp.asarray(wave),
            jnp.int32(n_true),
            self.mel_filters,
            self.n_fft,
            self.hop_length,
        )
        return mel, n_true


@functools.partial(jax.jit, static_argnums=(3, 4))
def _extract_jit(wave, n_true_frames, mel_filters, n_fft, hop_length):
    return log_mel_from_padded(
        wave, n_true_frames, mel_filters, n_fft, hop_length
    )


@functools.lru_cache(maxsize=4)
def _dft_consts(n_fft: int):
    # cache host numpy constants (NOT jnp arrays: a device constant
    # created during a trace would leak a tracer into later traces)
    return dft_matrices(n_fft)


def _raw_log_mel(wave, n_true_frames, mel_filters, n_fft, hop_length):
    """log10(mel power) before normalization; returns (log_mel, frame_valid).

    ``wave`` must already carry the reflect padding from ``pad_waveform``;
    its length determines the static frame count
    ``(len(wave) - 2*(n_fft//2)) // hop``. The Hann window is folded into
    the host-side DFT constants.
    """
    pad = n_fft // 2
    num_frames = (wave.shape[0] - 2 * pad) // hop_length
    # Framing by strided slices: view the waveform as (., hop) rows; frame
    # t = rows[t] ++ rows[t+1] ++ rows[t+2][:n_fft - 2*hop]. Pure slices +
    # concat — a 1.2M-element gather or XLA's TPU FFT are each ~10x
    # slower at these sizes. The DFT itself is two MXU matmuls against
    # windowed cos/-sin constants (see dft_matrices).
    k_full, rem = n_fft // hop_length, n_fft % hop_length
    rows_needed = num_frames + k_full + (1 if rem else 0)
    wave_p = jnp.pad(
        wave.astype(jnp.float32),
        (0, rows_needed * hop_length - wave.shape[0]),
    )
    rows = wave_p.reshape(rows_needed, hop_length)
    parts = [rows[i : num_frames + i] for i in range(k_full)]
    if rem:
        parts.append(rows[k_full : num_frames + k_full, :rem])
    frames = jnp.concatenate(parts, axis=1)  # (num_frames, n_fft)

    dft_cos, dft_sin = _dft_consts(n_fft)
    host_window = hann_window(n_fft)  # host constant (the traced `window`
    wcos = jnp.asarray(dft_cos * host_window[:, None])  # arg can't fold)
    wsin = jnp.asarray(dft_sin * host_window[:, None])
    re = jnp.dot(frames, wcos, precision=jax.lax.Precision.HIGHEST)
    im = jnp.dot(frames, wsin, precision=jax.lax.Precision.HIGHEST)
    power = re * re + im * im  # (num_frames, n_freqs)

    # Mel projection: (mels, bins) @ (bins, frames)
    mel = mel_filters @ power.T

    frame_valid = jnp.arange(num_frames) < n_true_frames
    log_mel = jnp.log10(jnp.maximum(mel, 1e-10))
    return log_mel, frame_valid


def raw_log_mel_max(wave, n_true_frames, mel_filters,
                    n_fft: int = 400, hop_length: int = 160):
    """Max of log10 mel power over the true frames (a traced scalar).

    The Whisper normalization floors at ``global_max - 8``; incremental
    (streaming) encoding tracks this max across updates so per-window
    encodes can apply the same floor the full-utterance pass would.
    """
    log_mel, frame_valid = _raw_log_mel(
        wave, n_true_frames, mel_filters, n_fft, hop_length
    )
    return jnp.max(jnp.where(frame_valid[None, :], log_mel, -jnp.inf))


def log_mel_from_padded(wave, n_true_frames, mel_filters,
                        n_fft: int = 400, hop_length: int = 160,
                        log_max=None):
    """Core traced computation (also reusable inside larger jit graphs).

    When ``log_max`` is None the Whisper floor uses the max over this
    waveform's true frames (the reference semantics, src/mel.rs:88-92);
    streaming passes the session-wide running max instead so per-window
    mels match what a full-utterance pass would produce.
    """
    log_mel, frame_valid = _raw_log_mel(
        wave, n_true_frames, mel_filters, n_fft, hop_length
    )
    if log_max is None:
        log_max = jnp.max(jnp.where(frame_valid[None, :], log_mel, -jnp.inf))
    log_mel = jnp.maximum(log_mel, log_max - 8.0)
    log_mel = (log_mel + 4.0) / 4.0
    # Padded frames become exactly 0.0 — the value the reference uses when
    # zero-padding encoder tail chunks (src/audio_encoder.rs:109-113).
    return jnp.where(frame_valid[None, :], log_mel, 0.0)
