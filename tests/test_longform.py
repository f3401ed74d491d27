"""Long-form overlap-stitch tests."""

import numpy as np

from qwen3_asr_rs_tpu.runtime.longform import best_join, stitch


def test_best_join_exact_overlap():
    prev = "a b c d e f g".split()
    nxt = "e f g h i j".split()
    drop_prev, drop_next = best_join(prev, nxt)
    merged = prev[:-drop_prev] if drop_prev else prev
    merged = merged + nxt[drop_next:]
    assert merged == "a b c d e f g h i j".split()


def test_best_join_inner_overlap_with_noise():
    # segment boundaries often garble the outermost words
    prev = "the quick brown fox jumps xx".split()
    nxt = "yy fox jumps over the lazy dog".split()
    drop_prev, drop_next = best_join(prev, nxt)
    merged = (prev[:-drop_prev] if drop_prev else prev) + nxt[drop_next:]
    assert "fox jumps over the lazy dog" in " ".join(merged)
    assert " ".join(merged).count("fox jumps") == 1


def test_best_join_no_overlap():
    assert best_join("a b c".split(), "x y z".split()) == (0, 0)


def test_stitch_chain():
    segs = [
        "one two three four",
        "three four five six",
        "five six seven eight",
    ]
    assert stitch(segs) == "one two three four five six seven eight"
    assert stitch([]) == ""
    assert stitch(["solo"]) == "solo"


def test_engine_longform_overlap(rng, tmp_path):
    from test_engine_e2e import make_engine
    from test_audio_io import write_wav_pcm16

    eng, *_ = make_engine(max_new=2)  # max bucket 8s
    wav = tmp_path / "long.wav"
    write_wav_pcm16(wav, rng.standard_normal(16000 * 20) * 0.1, 16000)
    result = eng.transcribe(str(wav), overlap_seconds=1.0)
    # segments: starts at 0, 7, 14 (8s window, 1s overlap)
    assert result.raw_output.count("\n") == 2
    assert isinstance(result.text, str)
