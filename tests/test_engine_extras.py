"""Engine extras: warmup precompilation, long-form segmentation, errors."""

import numpy as np
import pytest

from qwen3_asr_rs_tpu.errors import AsrError, AudioError

from test_engine_e2e import make_engine


def test_warmup_precompiles_buckets(rng):
    eng, *_ = make_engine(max_new=2)
    eng.warmup(batch_sizes=(1,), buckets=(2,))
    assert (2, 1) in eng._graphs
    # a subsequent transcribe in that bucket reuses the compiled graph
    n_before = len(eng._graphs)
    eng.transcribe_samples(
        (rng.standard_normal(24000) * 0.1).astype(np.float32)
    )
    assert len(eng._graphs) == n_before


def test_long_form_segmentation(rng, tmp_path):
    # engine max bucket is 8 chunks = 8 s; a 20 s file must be segmented
    eng, *_ = make_engine(max_new=2)
    from test_audio_io import write_wav_pcm16

    wav = tmp_path / "long.wav"
    write_wav_pcm16(
        wav, rng.standard_normal(16000 * 20) * 0.1, 16000
    )
    result = eng.transcribe(str(wav))
    assert result.raw_output.count("\n") == 2  # three segments


def test_audio_error_on_garbage_file(tmp_path):
    from qwen3_asr_rs_tpu.audio.load import load_audio

    p = tmp_path / "junk.wav"
    p.write_bytes(b"not audio at all")
    with pytest.raises(AudioError):
        load_audio(str(p))
    assert issubclass(AudioError, AsrError)


def test_unknown_quantize_mode_rejected():
    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine
    from qwen3_asr_rs_tpu.config import tiny_test_config

    with pytest.raises(ValueError):
        AsrEngine(
            model_dir=None,
            config=tiny_test_config(),
            params=({}, {}),
            tokenizer=object(),
            quantize="int3",
        )
