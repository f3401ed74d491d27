"""Streaming transcriber mechanics on the tiny synthetic model."""

import numpy as np

from qwen3_asr_rs_tpu.runtime.streaming import (
    StreamingTranscriber,
    common_prefix_len,
)

from test_engine_e2e import make_engine


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
