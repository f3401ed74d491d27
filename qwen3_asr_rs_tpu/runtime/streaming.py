"""Streaming (low-latency incremental) transcription.

Qwen3-ASR is not a natively streaming model — the encoder is bidirectional
within 8-chunk windows and the decoder consumes the whole audio prompt —
so streaming is implemented as re-transcription with *stable-prefix
commitment* (the LocalAgreement policy used by whisper-streaming systems):

  * audio is fed incrementally; every ``update_interval_s`` of new audio
    triggers a re-transcription of the buffered audio (one fused TPU
    dispatch, shapes bucketed so recompiles are rare);
  * text is COMMITTED once the last ``agreement`` consecutive hypotheses
    share it as a common prefix — committed text never changes;
  * ``finalize()`` runs a last full pass and returns the final result.

The encoder's window structure makes incremental encoding possible
(completed 8-chunk windows never change); per-window encoder caching is a
planned optimization — the current implementation re-encodes, which is
cheap relative to decode.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional

import numpy as np

from .engine import AsrEngine, TranscribeResult

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class StreamUpdate:
    committed: str       # newly committed (stable) text this update
    hypothesis: str      # current full hypothesis (may still change)
    audio_seconds: float


def common_prefix_len(texts: list[str]) -> int:
    if not texts:
        return 0
    shortest = min(len(t) for t in texts)
    i = 0
    while i < shortest and all(t[i] == texts[0][i] for t in texts):
        i += 1
    return i


class StreamingTranscriber:
    """Incremental transcription session over an AsrEngine."""

    def __init__(
        self,
        engine: AsrEngine,
        language: Optional[str] = None,
        update_interval_s: float = 1.0,
        agreement: int = 2,
        sample_rate: int = 16000,
    ):
        self.engine = engine
        self.language = language
        self.update_interval = int(update_interval_s * sample_rate)
        self.agreement = max(1, agreement)
        self.sample_rate = sample_rate
        self._buffer = np.zeros(0, np.float32)
        self._since_update = 0
        self._hypotheses: list[str] = []
        self._committed = ""
        self._last_result: Optional[TranscribeResult] = None

    @property
    def committed_text(self) -> str:
        return self._committed

    def feed(self, samples: np.ndarray) -> Optional[StreamUpdate]:
        """Add audio; returns an update when a re-transcription ran."""
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._buffer = np.concatenate([self._buffer, samples])
        self._since_update += len(samples)
        if self._since_update < self.update_interval:
            return None
        self._since_update = 0
        return self._update()

    def _update(self) -> StreamUpdate:
        if len(self._buffer) < 400:
            return StreamUpdate("", self._committed,
                                len(self._buffer) / self.sample_rate)
        result = self.engine.transcribe_samples(self._buffer, self.language)
        self._last_result = result
        hyp = result.text
        self._hypotheses.append(hyp)

        newly = ""
        if len(self._hypotheses) >= self.agreement:
            window = self._hypotheses[-self.agreement:]
            stable = common_prefix_len(window)
            if stable > len(self._committed):
                newly = self._hypotheses[-1][len(self._committed):stable]
                self._committed = self._hypotheses[-1][:stable]
        logger.debug(
            "stream update: %.1fs audio, hyp %r, committed %r",
            len(self._buffer) / self.sample_rate, hyp, self._committed,
        )
        return StreamUpdate(
            committed=newly,
            hypothesis=hyp,
            audio_seconds=len(self._buffer) / self.sample_rate,
        )

    def finalize(self) -> TranscribeResult:
        """Final full-quality pass over all buffered audio."""
        if len(self._buffer) < 400:
            return TranscribeResult(text=self._committed, language="unknown",
                                    raw_output="")
        result = self.engine.transcribe_samples(self._buffer, self.language)
        self._committed = result.text
        self._last_result = result
        return result
