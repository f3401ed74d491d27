"""Streaming transcriber mechanics on the tiny synthetic model."""

import numpy as np

from qwen3_asr_rs_tpu.runtime.streaming import (
    StreamingTranscriber,
    common_prefix_len,
)

from test_engine_e2e import make_engine
import pytest

pytestmark = pytest.mark.slow  # heavy parity/e2e: quick tier skips


def test_common_prefix_len():
    assert common_prefix_len(["hello world", "hello there"]) == 6
    assert common_prefix_len(["abc", "abc"]) == 3
    assert common_prefix_len(["a", ""]) == 0
    assert common_prefix_len([]) == 0


def test_streaming_commits_monotonically(rng):
    eng, *_ = make_engine(max_new=4)
    stream = StreamingTranscriber(eng, update_interval_s=1.0, agreement=2)

    committed_history = []
    for _ in range(4):
        chunk = (rng.standard_normal(16000) * 0.1).astype(np.float32)
        update = stream.feed(chunk)
        if update is not None:
            committed_history.append(stream.committed_text)
            # hypothesis extends or revises, but committed text only grows
            assert stream.committed_text.startswith(
                committed_history[max(0, len(committed_history) - 2)]
                if len(committed_history) > 1 else ""
            )

    final = stream.finalize()
    assert isinstance(final.text, str)
    # every earlier commitment is a prefix of its successors
    for a, b in zip(committed_history, committed_history[1:]):
        assert b.startswith(a)


def test_streaming_small_feed_no_update(rng):
    eng, *_ = make_engine(max_new=2)
    stream = StreamingTranscriber(eng, update_interval_s=10.0)
    assert stream.feed(np.zeros(100, np.float32)) is None
    assert stream.committed_text == ""


def _wide_engine(max_new=4):
    """Tiny engine with buckets wide enough for multi-window audio."""
    import dataclasses

    import jax.numpy as jnp
    from qwen3_asr_rs_tpu.config import tiny_test_config
    from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
    from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params
    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine
    from test_engine_e2e import MockTokenizer

    cfg = tiny_test_config()
    text = dataclasses.replace(cfg.text, vocab_size=151936)
    cfg = dataclasses.replace(
        cfg, thinker_config=dataclasses.replace(
            cfg.thinker_config, text_config=text)
    )
    enc_params = init_encoder_params(cfg.audio, dtype=jnp.float32)
    dec_params = init_decoder_params(cfg.text, dtype=jnp.float32)
    return AsrEngine(
        model_dir=None, dtype=jnp.float32, max_new_tokens=max_new,
        chunk_buckets=(2, 15), config=cfg,
        params=(enc_params, dec_params), tokenizer=MockTokenizer(),
    )


def _speechlike(rng, seconds):
    """Signal with an early loud onset so the mel max stabilizes."""
    n = int(16000 * seconds)
    x = (rng.standard_normal(n) * 0.05).astype(np.float32)
    x[:8000] += np.sin(2 * np.pi * 300 * np.arange(8000) / 16000).astype(
        np.float32
    ) * 0.8
    return x


def test_streaming_session_matches_offline_engine(rng):
    """Incremental session (cached windows + chunked prefill) must emit the
    SAME tokens as the offline engine over the same buffered audio."""
    from qwen3_asr_rs_tpu.runtime.streaming import StreamingSession

    eng = _wide_engine(max_new=4)
    audio = _speechlike(rng, 11.0)  # 1 complete window + 3 s tail

    session = StreamingSession(eng, max_new_tokens=4)
    # feed in 2 s increments, updating each time (exercises reuse)
    step = 32000
    result = None
    for off in range(0, len(audio), step):
        session.buffer = audio[: off + step]
        result = session.update()

    offline = eng.transcribe_samples(audio)
    assert result.raw_output == offline.raw_output


def test_streaming_reencodes_at_most_two_windows(rng):
    """After warm-up, each update must touch <= 2 encoder windows (the
    newly-completed one and the partial tail) and a bounded chunk."""
    from qwen3_asr_rs_tpu.runtime.streaming import StreamingSession

    eng = _wide_engine(max_new=2)
    audio = _speechlike(rng, 14.0)

    session = StreamingSession(eng, max_new_tokens=2)
    for sec in range(2, 15, 2):
        session.buffer = audio[: sec * 16000]
        session.update()
        if sec > 2:
            stats = session.last_update_stats
            assert stats["windows_encoded"] <= 2, stats
            # chunk covers at most one window + tail + prompt tail
            assert stats["chunk_positions"] <= 2 * 104 + 40, stats


def test_streaming_rollover_past_capacity(rng):
    """Sessions larger than the slab must roll over, not raise (round-1
    bug: feeds past the largest bucket failed forever)."""
    eng = _wide_engine(max_new=2)
    stream = StreamingTranscriber(
        eng, update_interval_s=2.0, max_stream_seconds=8.0,
        max_new_tokens=2,
    )
    for _ in range(10):  # 20 s total >> 8 s capacity
        chunk = (rng.standard_normal(32000) * 0.1).astype(np.float32)
        up = stream.feed(chunk)
        assert up is not None
    final = stream.finalize()
    assert isinstance(final.text, str)


def test_giant_single_feed_rolls_over_safely(rng):
    """One feed larger than session capacity must roll over BEFORE the
    update (an oversized update would clamp KV writes past the slab);
    multiple rollovers in one update are fine."""
    eng = _wide_engine(max_new=2)
    stream = StreamingTranscriber(
        eng, update_interval_s=1.0, max_stream_seconds=8.0,
        max_new_tokens=2,
    )
    chunk = (rng.standard_normal(16000 * 20) * 0.1).astype(np.float32)
    up = stream.feed(chunk)  # 20 s >> 8 s capacity in ONE feed
    assert up is not None
    assert len(stream.session.buffer) <= stream.session.max_samples
    final = stream.finalize()
    assert isinstance(final.text, str)


def test_rollover_commit_appears_in_update_deltas(rng):
    """Concatenating StreamUpdate.committed deltas must reconstruct the
    committed text — the rollover's own commitment included."""
    eng = _wide_engine(max_new=2)
    stream = StreamingTranscriber(
        eng, update_interval_s=2.0, max_stream_seconds=8.0,
        max_new_tokens=2, agreement=2,
    )
    deltas = []
    for _ in range(10):  # 20 s total: at least one rollover
        chunk = (rng.standard_normal(32000) * 0.1).astype(np.float32)
        up = stream.feed(chunk)
        if up is not None:
            deltas.append(up.committed)
    assert "".join(deltas) == stream.committed_text


def test_rollover_carries_audio_overlap(rng):
    """The post-rollover session starts with overlap audio so boundary
    words are re-heard and stitched, not lost."""
    eng = _wide_engine(max_new=2)
    stream = StreamingTranscriber(
        eng, update_interval_s=2.0, max_stream_seconds=8.0,
        max_new_tokens=2, rollover_overlap_s=2.0,
    )
    for _ in range(6):  # 12 s: one rollover past the 8 s capacity
        stream.feed((rng.standard_normal(32000) * 0.1).astype(np.float32))
    assert stream._rolled  # a session completed
    assert stream._overlap_carried
    # the new session retains at least the overlap worth of audio
    assert len(stream.session.buffer) >= stream.rollover_overlap


def test_mel_floor_invalidation_uses_encode_time_max(rng):
    """A gradual mel-max rise (each step under tolerance, total far
    over) must still re-encode cached windows: the comparison base is
    the encode-time max, not the ratcheting running max."""
    from qwen3_asr_rs_tpu.runtime.streaming import StreamingSession

    eng = _wide_engine(max_new=2)
    session = StreamingSession(eng, max_new_tokens=2)
    base = _speechlike(rng, 2.0) * 0.001  # quiet start
    session.buffer = base
    session.update()
    assert np.isfinite(session.encode_max)
    first_encode_max = session.encode_max
    # grow by one window at a time, each 2.5x louder (~0.4 log10 units,
    # below the 0.5 tolerance per step; cumulatively far above it)
    audio = [base]
    amp = 0.001
    for step in range(1, 6):
        amp *= 2.5
        audio.append(_speechlike(rng, 2.0) * amp)
        session.buffer = np.concatenate(audio)
        session.update()
    # the cached windows' floor must be within tolerance of the running
    # max (the buggy version ratcheted: encode_max stayed at the quiet
    # start while session_max rose ~2 log10 units)
    assert session.session_max - session.encode_max <= (
        session.MAX_TOLERANCE + 1e-6
    )
    assert session.encode_max > first_encode_max
