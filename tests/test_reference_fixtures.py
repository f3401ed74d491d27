"""CLI E2E over the reference repo's three audio fixtures.

Mirrors the reference's CI contract (.github/workflows/ci.yml:129-137):
run the CLI on sample{1,2,3}.wav and assert success + output format.
Transcript *content* parity needs real model weights (not available in
this environment), so a synthetic tiny checkpoint is used — the full
pipeline (24 kHz WAV decode -> resample -> mel -> encode -> decode ->
parse) is still exercised end to end.
"""

from pathlib import Path

import jax.numpy as jnp
import pytest

from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params
from qwen3_asr_rs_tpu.weights.export import save_checkpoint

from test_weights_roundtrip import _tiny_cfg_real_vocab, write_word_tokenizer

FIXTURES = sorted(Path("/root/reference/test_audio").glob("*.wav"))


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    cfg = _tiny_cfg_real_vocab()
    d = tmp_path_factory.mktemp("model")
    save_checkpoint(
        d,
        init_encoder_params(cfg.audio, dtype=jnp.float32),
        init_decoder_params(cfg.text, dtype=jnp.float32),
        cfg,
    )
    write_word_tokenizer(d)
    return d


@pytest.mark.parametrize("wav", FIXTURES, ids=[p.stem for p in FIXTURES])
def test_cli_on_reference_fixture(model_dir, wav, capsys, monkeypatch):
    monkeypatch.setenv("ASR_MAX_NEW_TOKENS", "3")
    monkeypatch.setenv("ASR_DTYPE", "float32")
    from qwen3_asr_rs_tpu.cli import main

    rc = main([str(model_dir), str(wav)])
    assert rc == 0
    out = capsys.readouterr().out.strip().split("\n")
    assert out[0].startswith("Language:")
    assert out[1].startswith("Text:")


def test_cli_undecodable_audio_clean_error(model_dir, tmp_path, capsys,
                                            monkeypatch):
    """Garbage audio -> one-line `Error:` message, exit 1, no traceback."""
    monkeypatch.setenv("ASR_DTYPE", "float32")
    junk = tmp_path / "junk.wav"
    junk.write_bytes(b"definitely not audio")
    from qwen3_asr_rs_tpu.cli import main

    rc = main([str(model_dir), str(junk)])
    assert rc == 1
    err = capsys.readouterr().err
    assert "Error: Could not decode audio file" in err


def test_cli_multi_file_batch(model_dir, capsys, monkeypatch):
    """CLI extension: several audio files -> one batched dispatch."""
    monkeypatch.setenv("ASR_MAX_NEW_TOKENS", "3")
    monkeypatch.setenv("ASR_DTYPE", "float32")
    from qwen3_asr_rs_tpu.cli import main

    rc = main([str(model_dir), str(FIXTURES[0]), str(FIXTURES[1])])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("File: ") == 2
    assert out.count("Language:") == 2
    assert out.count("Text:") == 2


def test_cli_forced_language_on_fixture(model_dir, capsys, monkeypatch,
                                        tmp_path):
    monkeypatch.setenv("ASR_MAX_NEW_TOKENS", "3")
    monkeypatch.setenv("ASR_DTYPE", "float32")
    metrics = tmp_path / "metrics.json"
    monkeypatch.setenv("ASR_METRICS", str(metrics))
    from qwen3_asr_rs_tpu.cli import main

    rc = main([str(model_dir), str(FIXTURES[0]), "english"])
    assert rc == 0
    out = capsys.readouterr().out.strip().split("\n")
    assert out[0] == "Language: forced"
    # metrics export (ASR_METRICS)
    import json

    data = json.loads(metrics.read_text())
    assert "device_dispatch" in data
    assert data["device_dispatch"]["count"] >= 1


def test_cli_sampling_flags(model_dir, capsys, monkeypatch):
    """--temperature runs the stochastic decode path with the same
    stdout contract; bad/ineffective sampling flags are diagnosed."""
    monkeypatch.setenv("ASR_MAX_NEW_TOKENS", "3")
    monkeypatch.setenv("ASR_DTYPE", "float32")
    from qwen3_asr_rs_tpu.cli import main

    rc = main([str(model_dir), str(FIXTURES[0]),
               "--temperature", "0.9", "--seed", "3"])
    assert rc == 0
    out = capsys.readouterr().out.strip().split("\n")
    assert out[0].startswith("Language:")
    assert out[1].startswith("Text:")

    # negative temperature: clean one-line error, not silent greedy
    rc = main([str(model_dir), str(FIXTURES[0]), "--temperature", "-1"])
    assert rc == 1
    assert "temperature must be >= 0" in capsys.readouterr().err

    # top-p out of range errors even without temperature
    rc = main([str(model_dir), str(FIXTURES[0]), "--top-p", "0"])
    assert rc == 1
    assert "top_p must be in" in capsys.readouterr().err

    # filters without --temperature: warn, decode greedily
    import logging

    caplog_records = []

    class _H(logging.Handler):
        def emit(self, record):
            caplog_records.append(record.getMessage())

    h = _H()
    logging.getLogger("asr").addHandler(h)
    try:
        rc = main([str(model_dir), str(FIXTURES[0]), "--top-k", "5"])
    finally:
        logging.getLogger("asr").removeHandler(h)
    assert rc == 0
    assert any("no effect without" in m for m in caplog_records)


def test_cli_longform_sampling_clean_error(model_dir, capsys, monkeypatch,
                                           tmp_path):
    """Sampling + long-form audio -> one-line Error, not a traceback."""
    import wave as wave_mod

    import numpy as np

    monkeypatch.setenv("ASR_MAX_NEW_TOKENS", "3")
    monkeypatch.setenv("ASR_DTYPE", "float32")
    # shrink the engine's buckets so a 40 s clip is long-form (the
    # default largest bucket is 360 s — a real long-form clip would be
    # a minutes-long test)
    import qwen3_asr_rs_tpu.runtime.engine as engine_mod

    orig_init = engine_mod.AsrEngine.__init__

    def small_buckets_init(self, *a, **kw):
        kw["chunk_buckets"] = (2, 4, 8)
        orig_init(self, *a, **kw)

    monkeypatch.setattr(engine_mod.AsrEngine, "__init__",
                        small_buckets_init)
    rng = np.random.default_rng(0)
    long_wav = tmp_path / "long.wav"
    with wave_mod.open(str(long_wav), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(
            (rng.standard_normal(16000 * 40) * 3000)
            .astype(np.int16).tobytes()
        )
    from qwen3_asr_rs_tpu.cli import main

    rc = main([str(model_dir), str(long_wav), "--temperature", "0.8"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "Error:" in err and "long-form" in err


def test_cli_batch_timestamps_consistent_with_single(model_dir, capsys,
                                                     monkeypatch):
    """--timestamps in the multi-file batch path prints the same Segment
    spans the single-file path would (one whole-file span per non-empty
    transcript), not a synthetic always-printed line."""
    monkeypatch.setenv("ASR_MAX_NEW_TOKENS", "3")
    monkeypatch.setenv("ASR_DTYPE", "float32")
    from qwen3_asr_rs_tpu.cli import main

    rc = main([
        str(model_dir), str(FIXTURES[0]), str(FIXTURES[1]), "--timestamps"
    ])
    assert rc == 0
    batch_out = capsys.readouterr().out
    # each file with non-empty text gets exactly one [start - end] span
    import re

    spans = re.findall(r"^\[(\d+\.\d\d) - (\d+\.\d\d)\] ", batch_out,
                       re.MULTILINE)
    texts = re.findall(r"^Text: (.*)$", batch_out, re.MULTILINE)
    assert len(spans) == sum(1 for t in texts if t.strip())
    for start, _end in spans:
        assert start == "0.00"
    # every non-empty segment span is followed by indented per-word
    # rows; word count matches whitespace words of the Text line
    word_rows = re.findall(r"^  \[(\d+\.\d\d) - (\d+\.\d\d)\] (.+)$",
                           batch_out, re.MULTILINE)
    n_words = sum(len(t.split()) for t in texts if t.strip())
    if n_words:
        assert len(word_rows) >= len(spans)
