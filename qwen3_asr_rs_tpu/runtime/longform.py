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
import re
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

# Scripts written without inter-word spaces (CJK + fullwidth forms).
# str.split() on such text yields one giant "word" per segment, so no
# join is ever found and the overlap DUPLICATES (the reference's sample3
# fixture is Chinese — /root/reference/test_audio/sample3.txt); these
# characters therefore become single-character join units instead.
_CJK_RANGES = (
    "ᄀ-ᇿ"   # Hangul Jamo
    "⺀-〿"   # CJK radicals, Kangxi, CJK symbols & punctuation
    "぀-ヿ"   # Hiragana, Katakana
    "㄰-㆏"   # Hangul compatibility Jamo
    "ㇰ-ㇿ"   # Katakana phonetic extensions
    "㐀-䶿"   # CJK extension A
    "一-鿿"   # CJK unified ideographs
    "가-힯"   # Hangul syllables
    "豈-﫿"   # CJK compatibility ideographs
    "＀-･"   # fullwidth forms incl. ，！？
)
_CJK_RE = re.compile(f"[{_CJK_RANGES}]")
# a unit is one CJK character OR a maximal run of non-space non-CJK text.
# The (?!\s) guard keeps whitespace out of the units: U+3000 IDEOGRAPHIC
# SPACE falls inside the CJK-symbols range, and a space that counted as
# a join unit could satisfy best_join's 2-unit credible-match threshold
# and delete real text on a false join.
_UNIT_RE = re.compile(f"(?!\\s)[{_CJK_RANGES}]|[^\\s{_CJK_RANGES}]+")


def _split_units(text: str) -> list[tuple[str, int]]:
    """(unit, start_char_offset) list: CJK chars are single units,
    everything else splits on whitespace. Mixed-script text yields mixed
    units, so joins work across e.g. Chinese with Latin names inline."""
    return [(m.group(), m.start()) for m in _UNIT_RE.finditer(text)]


MAX_EDGE_NOISE = 2  # garbled units tolerated at a segment boundary


def best_join(prev_words: list[str], next_words: list[str],
              search: int = 30) -> tuple[int, int]:
    """Find the best (drop_from_prev_end, drop_from_next_start) join.

    Searches for the longest common contiguous unit run ANCHORED at the
    junction: the match must reach within MAX_EDGE_NOISE units of the
    previous segment's end and begin within MAX_EDGE_NOISE units of the
    next segment's start — that is where the audio overlap physically
    is. An unanchored search deletes real text on repetitive speech
    (e.g. prev ending in 30x 'yeah': the earliest 5-long match would
    drop all 30). Ties prefer the LATEST match in the tail (smallest
    deletion). Returns unit counts to trim from each side so the
    overlap region appears exactly once; (0, 0) when no credible
    (>= 2 contiguous units, anchored) match exists.
    """
    tail = prev_words[-search:]
    head = next_words[:search]
    best_key = None
    best = (0, 0)
    for i in range(len(tail)):
        for j in range(min(len(head), MAX_EDGE_NOISE + 1)):
            k = 0
            while (
                i + k < len(tail)
                and j + k < len(head)
                and tail[i + k] == head[j + k]
            ):
                k += 1
            if k >= 2 and len(tail) - (i + k) <= MAX_EDGE_NOISE:
                key = (k, i)  # longest run, then latest position
                if best_key is None or key > best_key:
                    best_key = key
                    # keep the overlap words from the next segment:
                    # drop the matched tail words (and trailing garble)
                    # from prev, drop the pre-match words from next
                    best = (len(tail) - i, j)
    return best


def stitch(transcripts: list[str]) -> str:
    """Merge overlapped segment transcripts into one.

    Join units are whitespace words for spaced scripts and single
    characters for CJK (see _split_units), and the merge cuts the
    ORIGINAL strings at unit offsets, so the surviving text keeps its
    exact spacing (e.g. Chinese with spaced Latin names inline).
    """
    merged = ""
    for nxt in transcripts:
        if not merged:
            merged = nxt
            continue
        if not nxt:
            continue
        pu = _split_units(merged)
        nu = _split_units(nxt)
        drop_prev, drop_next = best_join(
            [u for u, _ in pu], [u for u, _ in nu]
        )
        if drop_prev:
            # cut both strings at the matched overlap: drop the match
            # (and trailing garble) from prev, keep it from next
            cut = pu[len(pu) - drop_prev][1]
            start = nu[drop_next][1] if drop_next < len(nu) else len(nxt)
            merged = merged[:cut] + nxt[start:]
        else:
            # no credible overlap: append, with a space only where the
            # boundary scripts use one
            lead = nxt.lstrip()
            sep = (
                ""
                if (merged[-1].isspace() or nxt[0].isspace()
                    or _CJK_RE.match(merged[-1]) or _CJK_RE.match(lead[:1]))
                else " "
            )
            merged = merged + sep + nxt
    return merged


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
