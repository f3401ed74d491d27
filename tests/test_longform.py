"""Long-form overlap-stitch tests."""

import numpy as np

from qwen3_asr_rs_tpu.runtime.longform import best_join, stitch
import pytest


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


@pytest.mark.slow
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


def test_stitch_chinese_overlap_not_duplicated():
    """CJK text has no spaces: units are characters, so the overlap
    region appears exactly once (round-2 bug: str.split() made each
    segment one giant 'word' and the overlap text duplicated)."""
    segs = [
        "你好，这是语音合成系统",
        "语音合成系统的持续集成测试。",
    ]
    out = stitch(segs)
    assert out == "你好，这是语音合成系统的持续集成测试。"
    assert out.count("语音合成系统") == 1


def test_stitch_mixed_cjk_latin_preserves_spacing():
    """Chinese with a spaced Latin name inline: the join crosses both
    scripts and the surviving text keeps its original spacing."""
    segs = [
        "你好，这是 Qwen3 语音合成",
        "Qwen3 语音合成系统的测试。",
    ]
    out = stitch(segs)
    assert out == "你好，这是 Qwen3 语音合成系统的测试。"
    assert out.count("Qwen3") == 1


def test_stitch_cjk_no_overlap_appends_without_space():
    assert stitch(["你好。", "世界。"]) == "你好。世界。"
    # spaced scripts still get the separating space
    assert stitch(["hello there", "general kenobi"]) == (
        "hello there general kenobi"
    )


def test_stitch_cjk_boundary_garble():
    """Garbled outermost characters at segment boundaries still join on
    the inner common run."""
    segs = [
        "今天天气很好我们去公园玩耍x",
        "y去公园玩耍然后回家吃饭",
    ]
    out = stitch(segs)
    assert out.count("去公园玩耍") == 1
    assert out.endswith("然后回家吃饭")


def test_ideographic_space_is_not_a_join_unit():
    """U+3000 sits in the CJK-symbols range but is whitespace: it must
    not count toward best_join's credible-match threshold (a false join
    deletes real text)."""
    from qwen3_asr_rs_tpu.runtime.longform import _split_units, stitch

    units = [u for u, _ in _split_units("。　好的")]
    assert "　" not in units
    # prev ends with [。 好的近况], next starts [　好，...]: only the
    # single unit 好 matches -> below threshold, nothing deleted
    prev = "。　好的近况"
    nxt = "　好，那我们"
    out = stitch([prev, nxt])
    assert "好的近况" in out


def test_best_join_repetitive_speech_keeps_text():
    """Unanchored matching used to delete ~25 real words when a phrase
    repeats: the join must anchor at the junction, trimming only the
    actual overlap."""
    prev = ("intro words " + "yeah " * 30).split()
    nxt = ("yeah " * 5 + "and then we left").split()
    drop_prev, drop_next = best_join(prev, nxt)
    merged = (prev[:-drop_prev] if drop_prev else prev) + nxt[drop_next:]
    # 30 yeahs in prev, 5 of which are the overlap re-heard by next
    assert merged.count("yeah") == 30
    assert " ".join(merged).endswith("and then we left")


def test_best_join_mid_tail_bigram_not_a_join():
    """A bigram recurring early in the tail (well before the junction)
    must not outrank the absence of a genuine overlap."""
    prev = "we said hello world early on and closed differently".split()
    nxt = "hello world is how the next clip starts".split()
    assert best_join(prev, nxt) == (0, 0)


def test_stitch_spans_concat_matches_stitch():
    """stitch() is stitch_spans() with provenance dropped — the piece
    concatenation must equal the merged transcript for every join kind
    (overlap cut, no-overlap append, CJK, empties)."""
    from qwen3_asr_rs_tpu.runtime.longform import stitch_spans

    cases = [
        ["one two three four", "three four five six", "five six seven"],
        ["a b c", "x y z"],  # no credible overlap -> append
        ["今天天气很好我们出去", "我们出去散步吧"],
        ["", "starts empty", "empty ends", ""],
        ["solo"],
        [],
    ]
    for segs in cases:
        spans = stitch_spans(segs)
        assert "".join(t for _, t in spans) == stitch(segs)
        # provenance indices are monotonically non-decreasing and valid
        idxs = [i for i, _ in spans]
        assert idxs == sorted(idxs)
        assert all(0 <= i < len(segs) for i in idxs)


def test_stitch_spans_provenance():
    from qwen3_asr_rs_tpu.runtime.longform import stitch_spans

    spans = stitch_spans(
        ["one two three four", "three four five six", "five six seven"]
    )
    # every input chunk contributes a piece, in order; at each junction
    # the overlap text survives from the NEXT chunk (prev is cut there)
    assert spans == [
        (0, "one two "),
        (1, "three four "),
        (2, "five six seven"),
    ]


@pytest.mark.slow
def test_longform_segments_and_batched_parity(rng, tmp_path):
    """Long-form results carry time-stamped segments, and the batched
    chunk decode (batch_chunks>1, the default) matches sequential."""
    from test_engine_e2e import make_engine

    from qwen3_asr_rs_tpu.runtime.longform import transcribe_long

    eng, *_ = make_engine(max_new=2)  # max bucket 8s
    samples = (rng.standard_normal(16000 * 20) * 0.1).astype("float32")

    batched = transcribe_long(eng, samples, overlap_seconds=1.0)
    sequential = transcribe_long(
        eng, samples, overlap_seconds=1.0, batch_chunks=1
    )
    assert batched.text == sequential.text
    assert batched.raw_output == sequential.raw_output

    # segments cover [0, 20s] with monotone, in-range times whose text
    # reconstructs the transcript
    segs = batched.segments
    assert segs is not None and len(segs) >= 1
    for a, b in zip(segs, segs[1:]):
        assert a.start <= b.start
    for s in segs:
        assert 0.0 <= s.start < s.end <= 20.0
    assert "".join(s.text for s in segs) == batched.text


@pytest.mark.slow
def test_transcribe_short_path_attaches_segment(rng, tmp_path):
    from test_audio_io import write_wav_pcm16
    from test_engine_e2e import make_engine

    eng, *_ = make_engine(max_new=2)
    wav = tmp_path / "short.wav"
    write_wav_pcm16(wav, rng.standard_normal(16000 * 2) * 0.1, 16000)
    r = eng.transcribe(str(wav))
    if r.text.strip():
        (seg,) = r.segments
        assert (seg.start, seg.end) == (0.0, 2.0)
        assert seg.text == r.text


@pytest.mark.slow
def test_longform_segments_non_overlapping(rng, monkeypatch):
    """Adjacent segment spans must not overlap in time (SRT/VTT cues):
    each span's end is clipped to the next span's start."""
    from test_engine_e2e import make_engine

    import qwen3_asr_rs_tpu.runtime.longform as lf

    eng, *_ = make_engine(max_new=2)  # max bucket 8s
    samples = (rng.standard_normal(16000 * 20) * 0.1).astype("float32")
    # pin the stitch to one surviving piece per decode segment so the
    # raw spans are guaranteed to overlap by overlap_seconds (random
    # weights often collapse pieces, hiding the clip under test)
    monkeypatch.setattr(
        lf, "stitch_spans",
        lambda texts: [(i, t or "x") for i, t in enumerate(texts)],
    )
    r = lf.transcribe_long(eng, samples, overlap_seconds=2.0)
    segs = r.segments
    assert len(segs) >= 2  # 20s over 8s buckets with overlap
    for a, b in zip(segs, segs[1:]):
        assert a.end <= b.start  # raw spans overlapped by ~2s
        assert a.start <= a.end


@pytest.mark.slow
def test_longform_batch_clamp_uses_compiled_bucket(rng, monkeypatch):
    """The HBM clamp must count the chunks of the bucket that actually
    compiles (next-larger bucket, batch padded UP to a power of two) —
    not ceil(segment_seconds). Regression: segment_seconds between
    buckets used to admit a padded batch 2x over budget."""
    from test_engine_e2e import make_engine

    import qwen3_asr_rs_tpu.runtime.longform as lf

    eng, *_ = make_engine(max_new=2)  # buckets (2, 4, 8)
    monkeypatch.setattr(lf, "LONGFORM_BATCH_BUDGET_CHUNKS", 32)

    seen = []
    orig = eng.transcribe_batch

    def spy(samples_list, languages=None, **kw):
        seen.append(len(samples_list))
        return orig(samples_list, languages, **kw)

    monkeypatch.setattr(eng, "transcribe_batch", spy)
    samples = (rng.standard_normal(16000 * 40) * 0.1).astype("float32")
    # 5s segments land in the 8-chunk bucket: budget 32 allows at most
    # 4 segments per dispatch (old clamp: ceil(5)=5 -> batch 6 -> padded
    # to 8 on the 8-chunk bucket = 64 chunks, 2x over)
    lf.transcribe_long(eng, samples, segment_seconds=5.0,
                       overlap_seconds=1.0)
    assert seen, "batched path not taken"
    assert max(seen) <= 4
    # and the device batch after padding stays a power of two <= 4
    assert all(s <= 4 for s in seen)


def test_word_timings_two_words():
    """The VERDICT's synthetic two-word case: a segment spanning
    [0, 8] with text 'hello world' yields two contiguous word spans
    proportional to character length (5 vs 5 chars -> equal halves)."""
    from qwen3_asr_rs_tpu.runtime.longform import word_timings

    words = word_timings("hello world", 0.0, 8.0)
    assert [w.word for w in words] == ["hello", "world"]
    assert words[0].start == 0.0
    assert words[-1].end == 8.0
    # contiguous partition, ordered
    assert words[0].end == words[1].start
    assert abs(words[0].end - 4.0) < 0.01  # equal char weight


def test_word_timings_cjk_per_character():
    """CJK text gets per-character spans (str.split would give one
    giant word), matching the stitcher's join units."""
    from qwen3_asr_rs_tpu.runtime.longform import word_timings

    words = word_timings("你好世界", 2.0, 6.0)
    assert [w.word for w in words] == ["你", "好", "世", "界"]
    assert words[0].start == 2.0 and words[-1].end == 6.0
    for a, b in zip(words, words[1:]):
        assert a.end == b.start
    assert abs(words[0].end - 3.0) < 0.01


def test_word_timings_empty_and_degenerate():
    from qwen3_asr_rs_tpu.runtime.longform import word_timings

    assert word_timings("", 0.0, 5.0) == []
    assert word_timings("   ", 0.0, 5.0) == []
    # zero-duration segment: all words collapse to the same instant
    ws = word_timings("a b", 3.0, 3.0)
    assert all(w.start == 3.0 and w.end == 3.0 for w in ws)


def test_attach_words_on_segments():
    from qwen3_asr_rs_tpu.runtime.longform import Segment, attach_words

    segs = [Segment(0, 0.0, 4.0, "one two"), Segment(1, 4.0, 6.0, "三")]
    attach_words(segs)
    assert [w.word for w in segs[0].words] == ["one", "two"]
    assert segs[1].words[0].start == 4.0
    assert segs[1].words[0].end == 6.0


@pytest.mark.slow
def test_transcribe_short_path_attaches_words(rng, tmp_path):
    from test_audio_io import write_wav_pcm16
    from test_engine_e2e import make_engine

    eng, *_ = make_engine(max_new=2)
    wav = tmp_path / "wordy.wav"
    write_wav_pcm16(wav, rng.standard_normal(16000 * 2) * 0.1, 16000)
    r = eng.transcribe(str(wav))
    for seg in r.segments or []:
        assert seg.words is not None
        if seg.text.strip():
            assert seg.words
            assert seg.words[0].start >= seg.start
            assert seg.words[-1].end <= seg.end + 1e-6
