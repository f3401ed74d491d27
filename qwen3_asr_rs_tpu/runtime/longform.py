"""Long-form transcription: overlapped segments with transcript stitching.

Audio longer than the largest compiled bucket is split into segments that
overlap by a couple of seconds; adjacent transcripts are merged at the
overlap by finding the best token-sequence join (longest common
contiguous word run inside the overlap region). This avoids both dropped
and duplicated words at segment boundaries — the failure mode of naive
chunking.

The reference handles long audio only through its windowed encoder (it
decodes any length in one pass, src/audio_encoder.rs:172-260); bucketed
compilation makes segmenting preferable here, and overlap-stitch keeps
boundary quality.
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)


def best_join(prev_words: list[str], next_words: list[str],
              search: int = 30) -> tuple[int, int]:
    """Find the best (drop_from_prev_end, drop_from_next_start) join.

    Searches for the longest common contiguous word run between the tail
    of ``prev_words`` and the head of ``next_words`` (both limited to
    ``search`` words). Returns word counts to trim from each side so the
    overlap region appears exactly once. (0, 0) when no overlap is found.
    """
    tail = prev_words[-search:]
    head = next_words[:search]
    best_len = 0
    best = (0, 0)
    for i in range(len(tail)):
        for j in range(len(head)):
            k = 0
            while (
                i + k < len(tail)
                and j + k < len(head)
                and tail[i + k] == head[j + k]
            ):
                k += 1
            if k > best_len:
                best_len = k
                # keep the overlap words from the next segment: drop the
                # matched tail words (and anything after them) from prev,
                # drop the pre-match words from next
                best = (len(tail) - i, j)
    if best_len < 2:  # require a credible match
        return (0, 0)
    return best


def stitch(transcripts: list[str]) -> str:
    """Merge overlapped segment transcripts into one."""
    if not transcripts:
        return ""
    merged = transcripts[0].split()
    for nxt in transcripts[1:]:
        nxt_words = nxt.split()
        drop_prev, drop_next = best_join(merged, nxt_words)
        if drop_prev:
            merged = merged[:-drop_prev]
        merged.extend(nxt_words[drop_next:])
    return " ".join(merged)


def transcribe_long(
    engine,
    samples: np.ndarray,
    language: Optional[str] = None,
    segment_seconds: Optional[float] = None,
    overlap_seconds: float = 2.0,
    sample_rate: int = 16000,
):
    """Overlapped segmentation + stitching over an AsrEngine."""
    from .engine import TranscribeResult

    max_seconds = segment_seconds or engine.max_bucket_seconds
    seg = int(max_seconds * sample_rate)
    overlap = int(min(overlap_seconds, max_seconds / 4) * sample_rate)
    step = seg - overlap

    texts, langs, raws = [], [], []
    start = 0
    while start < len(samples):
        chunk = samples[start : start + seg]
        if len(chunk) < 400:
            break
        r = engine.transcribe_samples(chunk, language)
        texts.append(r.text)
        langs.append(r.language)
        raws.append(r.raw_output)
        if start + seg >= len(samples):
            break
        start += step
    logger.info("long-form: %d segments stitched", len(texts))
    return TranscribeResult(
        text=stitch(texts),
        language=langs[0] if langs else "unknown",
        raw_output="\n".join(raws),
    )
