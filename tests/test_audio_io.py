"""Audio loading + resampling tests, incl. native/numpy cross-checks."""

import numpy as np
import pytest

from qwen3_asr_rs_tpu.audio.load import load_audio, load_audio_wav, read_wav
from qwen3_asr_rs_tpu.audio.resample import resample_sinc
from qwen3_asr_rs_tpu.audio import native

REF_SAMPLES = "/root/reference/test_audio/sample1.wav"


def write_wav_pcm16(path, samples, rate, channels=1):
    import struct

    x = np.clip(np.asarray(samples), -1, 1)
    pcm = (x * 32767).astype("<i2").tobytes()
    with open(path, "wb") as f:
        data_size = len(pcm)
        f.write(b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE")
        f.write(
            b"fmt " + struct.pack(
                "<IHHIIHH", 16, 1, channels, rate,
                rate * channels * 2, channels * 2, 16,
            )
        )
        f.write(b"data" + struct.pack("<I", data_size) + pcm)


def write_wav_extensible(path, samples, rate, subformat, bits):
    """WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE) with a real subformat GUID."""
    import struct

    x = np.asarray(samples)
    if subformat == 1:  # int PCM
        assert bits == 32
        pcm = (np.clip(x, -1, 1) * 2147483647).astype("<i4").tobytes()
    else:  # IEEE float
        assert bits == 32
        pcm = x.astype("<f4").tobytes()
    guid = struct.pack("<H", subformat) + bytes(
        [0, 0, 0, 0, 0x10, 0, 0x80, 0, 0, 0xAA, 0, 0x38, 0x9B, 0x71]
    )
    fmt = struct.pack(
        "<HHIIHH", 0xFFFE, 1, rate, rate * bits // 8, bits // 8, bits
    ) + struct.pack("<HHI", 22, bits, 0x4) + guid
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 12 + len(fmt) + 8 + len(pcm))
                + b"WAVE")
        f.write(b"fmt " + struct.pack("<I", len(fmt)) + fmt)
        f.write(b"data" + struct.pack("<I", len(pcm)) + pcm)


@pytest.mark.parametrize("subformat", [1, 3])
def test_wav_extensible_guid(tmp_path, rng, subformat):
    """Extensible WAVs must decode by subformat GUID, not a bit-depth guess.

    32-bit is the ambiguous case: int PCM and IEEE float are both 32-bit,
    so only the GUID disambiguates (the round-1 bug decoded one of them
    as garbage).
    """
    x = (rng.standard_normal(8000) * 0.2).astype(np.float32)
    p = tmp_path / f"ext{subformat}.wav"
    write_wav_extensible(p, x, 16000, subformat, 32)
    y = load_audio_wav(str(p), 16000)
    np.testing.assert_allclose(y, x, atol=1e-6)
    if native.native_available():
        z = native.native_load_wav(str(p), 16000)
        np.testing.assert_allclose(z, y, atol=1e-6)


def test_resample_preserves_tone():
    # 440 Hz sine at 24 kHz -> 16 kHz must stay 440 Hz, amplitude ~1
    rate_in, rate_out = 24000, 16000
    t = np.arange(rate_in) / rate_in
    x = np.sin(2 * np.pi * 440 * t)
    y = resample_sinc(x, rate_in, rate_out)
    assert abs(len(y) - rate_out) <= 2
    spec = np.abs(np.fft.rfft(y[1000:-1000] * np.hanning(len(y) - 2000)))
    freqs = np.fft.rfftfreq(len(y) - 2000, 1 / rate_out)
    peak = freqs[np.argmax(spec)]
    assert abs(peak - 440) < 2
    # amplitude preserved
    assert abs(np.max(np.abs(y[1000:-1000])) - 1.0) < 0.01


def test_resample_suppresses_alias():
    # 9 kHz tone at 24 kHz is above the 16 kHz Nyquist -> must be removed
    rate_in, rate_out = 24000, 16000
    t = np.arange(rate_in) / rate_in
    x = np.sin(2 * np.pi * 9000 * t)
    y = resample_sinc(x, rate_in, rate_out)
    assert np.max(np.abs(y[1000:-1000])) < 1e-3


def test_resample_identity():
    x = np.random.default_rng(0).standard_normal(1000)
    y = resample_sinc(x, 16000, 16000)
    np.testing.assert_allclose(y, x.astype(np.float32))


@pytest.mark.skipif(not native.native_available(), reason="native lib not built")
def test_native_matches_numpy_resample(rng):
    x = rng.standard_normal(24000) * 0.3
    a = resample_sinc(x, 24000, 16000)
    b = native.native_resample(x, 24000, 16000)
    assert len(a) == len(b)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_wav_roundtrip(tmp_path, rng):
    x = (rng.standard_normal(8000) * 0.2).astype(np.float32)
    p = tmp_path / "t.wav"
    write_wav_pcm16(p, x, 16000)
    y = load_audio_wav(str(p), 16000)
    np.testing.assert_allclose(y, np.round(x * 32767) / 32767, atol=1e-4)


def test_wav_stereo_mixdown(tmp_path):
    t = np.arange(4000) / 16000
    left = np.sin(2 * np.pi * 100 * t) * 0.5
    right = np.sin(2 * np.pi * 100 * t) * 0.25
    inter = np.stack([left, right], 1).reshape(-1)
    p = tmp_path / "st.wav"
    write_wav_pcm16(p, inter, 16000, channels=2)
    y = load_audio_wav(str(p), 16000)
    np.testing.assert_allclose(y, (left + right) / 2, atol=1e-3)


def test_reference_sample_loads():
    # the repo test fixtures: 24 kHz mono PCM16 -> resampled to 16 kHz
    frames, rate = read_wav(REF_SAMPLES)
    assert rate == 24000 and frames.shape[1] == 1
    y = load_audio(REF_SAMPLES, 16000)
    assert abs(len(y) / 16000 - frames.shape[0] / 24000) < 0.01
    assert np.max(np.abs(y)) <= 1.5


@pytest.mark.skipif(not native.native_available(), reason="native lib not built")
def test_native_wav_load_matches_python(tmp_path, rng):
    x = (rng.standard_normal(24000) * 0.2).astype(np.float32)
    p = tmp_path / "n.wav"
    write_wav_pcm16(p, x, 24000)
    a = native.native_load_wav(str(p), 16000)
    b = load_audio_wav(str(p), 16000)
    assert len(a) == len(b)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_non_wav_without_ffmpeg_actionable_error(tmp_path, monkeypatch):
    """A FLAC file with no decoder available must name the format and the
    fix, not fail with a generic parse error (round-1 gap: the capability
    silently disappeared)."""
    from qwen3_asr_rs_tpu.audio import native as native_mod
    from qwen3_asr_rs_tpu.audio.load import sniff_format
    from qwen3_asr_rs_tpu.errors import AudioError

    p = tmp_path / "x.flac"
    p.write_bytes(b"fLaC" + bytes(64))
    assert sniff_format(str(p)) == "flac"

    monkeypatch.setenv("PATH", str(tmp_path))  # hide any real ffmpeg
    monkeypatch.setattr(
        native_mod, "native_any_available", lambda: False
    )  # simulate a build without the libav shim
    with pytest.raises(AudioError, match="FLAC.*ffmpeg"):
        load_audio(str(p), 16000)


requires_libav = pytest.mark.skipif(
    not native.native_any_available(), reason="libav shim not built"
)


@requires_libav
@pytest.mark.parametrize("ext,atol", [("flac", 1e-4), ("ogg", 0.05)])
def test_native_libav_roundtrip(tmp_path, rng, ext, atol):
    """Encode a real compressed fixture with the libav shim, then decode
    it through load_audio WITHOUT any ffmpeg binary on PATH — the
    library-level decode path the reference gets via its libav FFI."""
    import os

    t = np.arange(16000) / 16000
    x = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    p = tmp_path / f"tone.{ext}"
    native.native_encode_test(str(p), x, 16000)
    assert p.stat().st_size > 1000

    old_path = os.environ.get("PATH", "")
    os.environ["PATH"] = str(tmp_path)  # no ffmpeg binary reachable
    try:
        y = load_audio(str(p), 16000)
    finally:
        os.environ["PATH"] = old_path
    assert abs(len(y) - len(x)) < 1600
    m = min(len(x), len(y))
    # compare mid-signal (codec delay/taper at the edges)
    np.testing.assert_allclose(y[2000:m - 2000], x[2000:m - 2000],
                               atol=max(atol, 0.02))


@requires_libav
def test_native_libav_resamples(tmp_path, rng):
    """24 kHz FLAC decodes to 16 kHz mono through the shim's swresample."""
    t = np.arange(24000) / 24000
    x = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = tmp_path / "t24.flac"
    native.native_encode_test(str(p), x, 24000)
    y = native.native_load_any(str(p), 16000)
    assert abs(len(y) - 16000) < 200
    spec = np.abs(np.fft.rfft(y[500:-500] * np.hanning(len(y) - 1000)))
    freqs = np.fft.rfftfreq(len(y) - 1000, 1 / 16000)
    assert abs(freqs[np.argmax(spec)] - 440) < 3


def test_sniff_formats(tmp_path):
    from qwen3_asr_rs_tpu.audio.load import sniff_format

    cases = {
        "a.ogg": b"OggS" + bytes(16),
        "a.mp3": b"ID3" + bytes(16),
        "a.m4a": bytes(4) + b"ftyp" + bytes(16),
    }
    for name, body in cases.items():
        f = tmp_path / name
        f.write_bytes(body)
        assert sniff_format(str(f)) == name.split(".")[1]


def test_native_sub_byte_bit_depth_errors_cleanly(tmp_path):
    """A 4-bit (ADPCM-style) WAV must raise, not SIGFPE the process
    (bits/8 == 0 divided the payload length before validation)."""
    import struct

    from qwen3_asr_rs_tpu.audio.native import native_available, native_load_wav

    if not native_available():
        pytest.skip("native library not built")
    data = b"\x00" * 64
    fmt = struct.pack("<HHIIHH", 17, 1, 16000, 8000, 1, 4)  # ADPCM, 4-bit
    riff = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    p = tmp_path / "adpcm.wav"
    p.write_bytes(riff)
    with pytest.raises(RuntimeError, match="bit depth|format"):
        native_load_wav(str(p), 16000)
