"""Streaming (low-latency incremental) transcription with KV/encoder reuse.

Qwen3-ASR is not a natively streaming model — the encoder is bidirectional
within 8-chunk windows and the decoder consumes the whole audio prompt —
but both structures are exploitable for incremental work:

  * the encoder's attention is block-diagonal over 8-chunk (8 s) windows
    (models/audio_encoder.py:146-162; reference src/audio_encoder.rs:172-260),
    so a COMPLETED window's embeddings never change as audio grows —
    ``StreamingSession`` encodes each window once and caches the result;
  * decoder attention is causal, so the KV cache rows for the prompt
    header + completed-window audio tokens are immutable —
    ``TextDecoder.prefill_chunk`` extends a persistent slab with just the
    changed suffix (the partial tail window + the few prompt-tail tokens).

Per update the device work is therefore O(new audio): at most 2 window
encodes (one newly-completed + the partial tail), one ~100-250-position
chunk prefill, and the greedy decode. The reference has no streaming mode
at all; the naive re-transcription baseline is O(total audio) per update.

One subtlety: the Whisper log-mel floors at ``global_max - 8``
(features/mel.py), a *global* statistic. The session tracks a running max
over all audio seen (raw_log_mel_max) and feeds it to every window encode;
if a later update raises the max beyond the ENCODE-TIME max of the
cached windows by more than a tolerance, they are invalidated and
re-encoded (rare in practice — the max stabilizes at the first loud
speech; comparing against the encode-time floor, not the running max,
keeps a gradual crescendo from ratcheting past the tolerance unnoticed).

Text commitment uses the LocalAgreement policy (commit the common prefix
of the last N hypotheses); committed text never changes.

Sessions are unbounded: when the audio outgrows the session's KV slab
capacity, the transcriber rolls over BEFORE the oversized update (an
overshooting prefill would clamp writes past the slab silently),
commits the finished session's hypothesis, and starts a fresh session
whose buffer begins with ~2 s of overlap audio; the junction is stitched
with longform.best_join so boundary words appear exactly once.
``finalize()`` runs an exact offline pass over the current session's
audio (bit-identical to the offline engine when no rollover occurred).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..features.mel import log_mel_from_padded, num_mel_frames, raw_log_mel_max
from ..models.text_decoder import KVCache, TextDecoder
from ..tokenizer import ENDOFTEXT_TOKEN_ID, IM_END_TOKEN_ID
from .engine import AsrEngine, TranscribeResult
from .prompt import AUDIO_OFFSET, build_prompt, parse_asr_output

logger = logging.getLogger(__name__)

HOP = 160
N_FFT = 400
SAMPLE_RATE = 16000


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


# ---------------------------------------------------------------------- #
# per-engine jit graphs (compiled once, shared by all sessions)
# ---------------------------------------------------------------------- #


class _StreamGraphs:
    """Jitted device graphs for incremental streaming over one engine."""

    def __init__(self, engine: AsrEngine, s_stream: int, max_new: int):
        self.engine = engine
        self.max_new = max_new
        cfg = engine.config
        self.decoder = TextDecoder(cfg.text, max_position=s_stream + 8)
        frontend = engine.frontend
        encoder = engine.encoder

        def window_encode(enc_params, wave, n_frames, log_max):
            mel = log_mel_from_padded(
                wave, n_frames, frontend.mel_filters, log_max=log_max
            )
            embeds, _ = encoder(enc_params, mel, n_frames)
            return embeds  # (chunks_per_window * tokens_per_chunk, H)

        def raw_max(wave, n_frames):
            return raw_log_mel_max(wave, n_frames, frontend.mel_filters)

        self.window_encode = jax.jit(window_encode)
        self.raw_max = jax.jit(raw_max)
        self._chunk_jit = {}

    def _hidden_from_chunk(self, dec_params, audio_embeds, token_ids,
                           audio_rel_start, n_audio_chunk):
        tok_embeds = self.decoder.embed(dec_params, token_ids[None])
        p = token_ids.shape[0]
        slots = jnp.arange(p)
        rel = slots - audio_rel_start
        is_audio = (rel >= 0) & (rel < n_audio_chunk)
        idx = jnp.clip(rel, 0, audio_embeds.shape[0] - 1)
        gathered = audio_embeds[idx][None].astype(tok_embeds.dtype)
        return jnp.where(is_audio[None, :, None], gathered, tok_embeds)

    def chunk_step(self, do_decode: bool, p_bucket: int):
        """Jitted: chunk prefill (+ optional greedy decode) on the slab."""
        key = (do_decode, p_bucket)
        if key not in self._chunk_jit:
            dec = self.decoder
            max_new = self.max_new

            def fn(dec_params, audio_embeds, token_ids, audio_rel_start,
                   n_audio_chunk, true_chunk, start, cache_k, cache_v):
                cache = KVCache(k=cache_k, v=cache_v)
                hidden = self._hidden_from_chunk(
                    dec_params, audio_embeds, token_ids,
                    audio_rel_start, n_audio_chunk,
                )
                logits, cache = dec.prefill_chunk(
                    dec_params, hidden, start, cache, true_chunk
                )
                out_buf = jnp.zeros((max_new,), jnp.int32)
                if not do_decode:
                    return out_buf, jnp.int32(0), cache.k, cache.v

                pos0 = start + true_chunk
                tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)

                def body(state):
                    cache, tok, out_buf, n_gen, done, step = state
                    is_eos = jnp.logical_or(
                        tok[0] == ENDOFTEXT_TOKEN_ID,
                        tok[0] == IM_END_TOKEN_ID,
                    )
                    out_buf = jnp.where(
                        is_eos, out_buf, out_buf.at[step].set(tok[0])
                    )
                    n_gen = jnp.where(is_eos, n_gen, n_gen + 1)
                    tok, cache = dec.decode_step_token(
                        dec_params, tok, pos0 + step, cache
                    )
                    return cache, tok, out_buf, n_gen, is_eos, step + 1

                def cond2(state):
                    _, _, _, _, done, step = state
                    return jnp.logical_and(~done, step < max_new)

                state = (cache, tok0, out_buf, jnp.int32(0),
                         jnp.bool_(False), jnp.int32(0))
                cache, _, out_buf, n_gen, _, _ = jax.lax.while_loop(
                    cond2, body, state
                )
                return out_buf, n_gen, cache.k, cache.v

            self._chunk_jit[key] = jax.jit(fn, donate_argnums=(7, 8))
        return self._chunk_jit[key]


def _stream_graphs(engine: AsrEngine, s_stream: int,
                   max_new: int) -> _StreamGraphs:
    cache = engine.__dict__.setdefault("_stream_graph_cache", {})
    key = (s_stream, max_new)
    if key not in cache:
        cache[key] = _StreamGraphs(engine, s_stream, max_new)
    return cache[key]


# ---------------------------------------------------------------------- #
# the incremental session
# ---------------------------------------------------------------------- #


class StreamingSession:
    """Incremental transcription state over a growing audio buffer.

    Holds the persistent KV slab, the per-window encoder cache and the
    running mel max. ``update()`` ingests whatever audio is currently in
    ``self.buffer`` and returns the current hypothesis text.
    """

    # re-encode cached windows when the running mel max rises by more
    # than this (log10 units); below it the floor shift is inaudible
    # (< tol/4 in normalized mel units, on floored (near-silent) bins only)
    MAX_TOLERANCE = 0.5

    def __init__(
        self,
        engine: AsrEngine,
        language: Optional[str] = None,
        max_stream_seconds: float = 120.0,
        max_new_tokens: int = 256,
    ):
        self.engine = engine
        self.language = language
        acfg = engine.config.audio
        self.cf = acfg.chunk_frames
        self.cpw = acfg.chunks_per_window
        self.tpc = acfg.tokens_per_chunk
        self.window_frames = self.cpw * self.cf
        self.window_samples = self.window_frames * HOP
        self.window_tokens = self.cpw * self.tpc

        max_chunks = int(np.ceil(max_stream_seconds * SAMPLE_RATE
                                 / (self.cf * HOP)))
        n_audio_max = max_chunks * self.tpc
        s = AUDIO_OFFSET + n_audio_max + 32 + max_new_tokens + 8
        self.s_stream = -(-s // 128) * 128
        self.max_samples = max_chunks * self.cf * HOP
        self.max_new = max_new_tokens

        self.graphs = _stream_graphs(engine, self.s_stream, max_new_tokens)
        self.buffer = np.zeros(0, np.float32)
        self.cache = KVCache.zeros(
            engine.config.text, 1, self.s_stream, dtype=engine.dtype
        )
        self.win_embeds: list = []   # device (window_tokens, H) per window
        self.kv_windows = 0          # windows whose KV rows are committed
        self.session_max = -np.inf   # running raw log10-mel max
        # mel max the oldest surviving cached window was encoded with:
        # invalidation compares against THIS, not the running max, so a
        # gradual rise cannot ratchet past the tolerance unnoticed
        self.encode_max = -np.inf
        self._win_max: dict[int, float] = {}  # per-window raw max
        # (wave, n_frames) built this update — reused between the raw-max
        # scan and the encode so each window ships to the device once
        self._wave_cache: dict[int, tuple] = {}
        self._zero_embeds = None
        self.last_update_stats: dict = {}

    # -------------------------------------------------------------- #

    @property
    def kv_len(self) -> int:
        return (AUDIO_OFFSET + self.kv_windows * self.window_tokens
                if self.kv_windows > 0 else 0)

    @property
    def full(self) -> bool:
        return len(self.buffer) >= self.max_samples

    def _window_wave(self, w: int, usable_len: int) -> tuple[np.ndarray, int]:
        """Build the padded wave for window ``w`` with exact mel context.

        Matches the full-buffer pad_waveform numerics: real left context
        (or start reflect for window 0), real right context for completed
        windows, hop-pad + end reflect for the tail window.
        """
        pad = N_FFT // 2
        start = w * self.window_samples
        end = min(usable_len, start + self.window_samples)
        total = self.window_samples + 2 * pad
        wave = np.zeros(total, np.float32)

        seg = self.buffer[start:end]
        n_frames = num_mel_frames(len(seg), HOP)
        hop_len = n_frames * HOP
        body = np.zeros(hop_len, np.float32)
        body[: len(seg)] = seg

        # left context: real samples, or reflect at the signal start
        if w == 0:
            wave[:pad] = self.buffer[pad:0:-1][: pad]
        else:
            wave[:pad] = self.buffer[start - pad : start]
        wave[pad : pad + hop_len] = body

        right = self.buffer[end : end + pad]
        if len(right) >= 40 and len(seg) == self.window_samples:
            # completed window: real right context (frames peek <= 40
            # samples past the window end)
            wave[pad + hop_len : pad + hop_len + len(right)] = right
        else:
            # tail window: end-reflect of the GLOBAL hop-padded wave,
            # exactly like pad_waveform on the full buffer (for tiny
            # tails the mirror reaches into the previous window)
            gidx = start + hop_len - 2 - np.arange(pad)
            ok = (gidx >= 0) & (gidx < usable_len)
            vals = np.where(
                ok,
                self.buffer[np.clip(gidx, 0, max(0, usable_len - 1))],
                0.0,
            )
            wave[pad + hop_len : pad + hop_len + pad] = vals
        return wave, n_frames

    def _cached_wave(self, w: int, usable_len: int):
        # device-resident: the raw-max scan and the encode reuse one
        # host build AND one H2D transfer per window per update
        if w not in self._wave_cache:
            wave, n_frames = self._window_wave(w, usable_len)
            self._wave_cache[w] = (jnp.asarray(wave), n_frames)
        return self._wave_cache[w]

    def _encode_window(self, w: int, usable_len: int):
        wave, n_frames = self._cached_wave(w, usable_len)
        return self.graphs.window_encode(
            self.engine.enc_params,
            wave,
            jnp.int32(n_frames),
            jnp.float32(self.session_max),
        )

    def _update_running_max(self, usable_len: int) -> bool:
        """Scan new/changed windows for the raw mel max. Returns True if
        the max rose beyond tolerance of the ENCODE-TIME max of the
        cached windows (cache invalidation)."""
        n_total = num_mel_frames(usable_len, HOP)
        last_w = (n_total - 1) // self.window_frames
        first = len(self.win_embeds)
        for w in range(first, last_w + 1):
            wave, n_frames = self._cached_wave(w, usable_len)
            m = float(
                self.graphs.raw_max(wave, jnp.int32(n_frames))
            )
            self._win_max[w] = m
        new_max = max(self._win_max.values(), default=-np.inf)
        rose = (
            np.isfinite(new_max)
            and np.isfinite(self.encode_max)
            and new_max > self.encode_max + self.MAX_TOLERANCE
        )
        if new_max > self.session_max:
            self.session_max = new_max
        return rose and len(self.win_embeds) > 0

    def _chunk_dispatch(self, do_decode: bool, audio_embeds, chunk_ids,
                        audio_rel_start, n_audio_chunk):
        true_chunk = len(chunk_ids)
        p_bucket = 128
        while p_bucket < true_chunk:
            p_bucket *= 2
        ids = np.zeros(p_bucket, np.int32)
        ids[:true_chunk] = chunk_ids
        fn = self.graphs.chunk_step(do_decode, p_bucket)
        out_buf, n_gen, k, v = fn(
            self.engine.dec_params,
            audio_embeds,
            jnp.asarray(ids),
            jnp.int32(audio_rel_start),
            jnp.int32(n_audio_chunk),
            jnp.int32(true_chunk),
            jnp.int32(self.kv_len),
            self.cache.k,
            self.cache.v,
        )
        self.cache = KVCache(k=k, v=v)
        return out_buf, n_gen

    def update(self) -> TranscribeResult:
        """Incrementally ingest the buffer; returns the current hypothesis."""
        assert len(self.buffer) >= N_FFT, "need at least one mel frame"
        assert len(self.buffer) <= self.max_samples, (
            "buffer exceeds session capacity; the transcriber must roll "
            "over BEFORE updating (positions past the slab would clamp "
            "silently)"
        )
        stats = {"windows_encoded": 0, "chunk_positions": 0}
        self._wave_cache = {}

        # windows are cacheable once their right mel context (40 samples)
        # has arrived; audio past the last full-or-partial window waits
        w_cacheable = 0
        while ((w_cacheable + 1) * self.window_samples + 40
               <= len(self.buffer)):
            w_cacheable += 1
        usable_len = min(
            len(self.buffer), (w_cacheable + 1) * self.window_samples
        )
        n_total_frames = num_mel_frames(usable_len, HOP)

        if self._update_running_max(usable_len):
            logger.info(
                "stream: mel max rose beyond tolerance; re-encoding "
                "%d cached windows", len(self.win_embeds),
            )
            self.win_embeds = []
            self.kv_windows = 0
        if not self.win_embeds:
            # the floor base for whatever gets cached from here on
            self.encode_max = self.session_max

        # encode newly completed windows
        while len(self.win_embeds) < w_cacheable:
            w = len(self.win_embeds)
            self.win_embeds.append(self._encode_window(w, usable_len))
            stats["windows_encoded"] += 1

        # tail (partial) window, re-encoded every update
        tail_frames = n_total_frames - w_cacheable * self.window_frames
        tail_embeds = None
        tail_valid = 0
        if tail_frames > 0:
            tail_embeds = self._encode_window(w_cacheable, usable_len)
            stats["windows_encoded"] += 1
            full_chunks, rem = divmod(tail_frames, self.cf)
            from ..config import feat_extract_output_length

            tail_valid = full_chunks * self.tpc + (
                feat_extract_output_length(rem) if rem else 0
            )

        n_audio = w_cacheable * self.window_tokens + tail_valid
        prompt = build_prompt(n_audio, self.language, self.engine.tokenizer)

        if self._zero_embeds is None:
            h = self.engine.config.audio.output_dim
            self._zero_embeds = jnp.zeros(
                (self.window_tokens, h), self.engine.dtype
            )

        # catch-up: commit all-but-one pending completed windows with
        # prefill-only chunks (one window each; happens on large feeds)
        while w_cacheable - self.kv_windows > 1:
            w = self.kv_windows
            kv_len = self.kv_len
            p_start = AUDIO_OFFSET + w * self.window_tokens
            chunk_ids = prompt[kv_len : p_start + self.window_tokens]
            src = jnp.concatenate(
                [self.win_embeds[w], self._zero_embeds], axis=0
            )
            self._chunk_dispatch(
                False, src, chunk_ids,
                audio_rel_start=max(0, AUDIO_OFFSET - kv_len),
                n_audio_chunk=self.window_tokens,
            )
            stats["chunk_positions"] += len(chunk_ids)
            self.kv_windows = w + 1

        # final chunk: (maybe one new window) + tail audio + prompt tail
        kv_len = self.kv_len
        chunk_ids = prompt[kv_len:]
        new_w = w_cacheable - self.kv_windows  # 0 or 1
        tail_src = (
            tail_embeds if tail_embeds is not None else self._zero_embeds
        )
        if new_w:
            src = jnp.concatenate(
                [self.win_embeds[self.kv_windows], tail_src], axis=0
            )
        else:
            src = jnp.concatenate([tail_src, self._zero_embeds], axis=0)
        n_audio_chunk = new_w * self.window_tokens + tail_valid
        out_buf, n_gen = self._chunk_dispatch(
            True, src, chunk_ids,
            audio_rel_start=max(0, AUDIO_OFFSET - kv_len),
            n_audio_chunk=n_audio_chunk,
        )
        stats["chunk_positions"] += len(chunk_ids)
        self.kv_windows = w_cacheable

        generated = np.asarray(out_buf)[: int(n_gen)].tolist()
        raw = self.engine.tokenizer.decode(generated)
        lang, text = parse_asr_output(raw, self.language is not None)
        stats["decoded_tokens"] = len(generated)
        self.last_update_stats = stats
        return TranscribeResult(text=text, language=lang, raw_output=raw)


# ---------------------------------------------------------------------- #
# public transcriber (LocalAgreement commitment + session rollover)
# ---------------------------------------------------------------------- #


class StreamingTranscriber:
    """Incremental transcription session over an AsrEngine."""

    def __init__(
        self,
        engine: AsrEngine,
        language: Optional[str] = None,
        update_interval_s: float = 1.0,
        agreement: int = 2,
        sample_rate: int = SAMPLE_RATE,
        max_stream_seconds: Optional[float] = None,
        max_new_tokens: Optional[int] = None,
        rollover_overlap_s: float = 2.0,
    ):
        self.engine = engine
        self.language = language
        self.update_interval = int(update_interval_s * sample_rate)
        self.agreement = max(1, agreement)
        self.sample_rate = sample_rate
        if max_stream_seconds is None:
            max_stream_seconds = min(engine.max_bucket_seconds, 120.0)
        if max_new_tokens is None:
            max_new_tokens = min(engine.max_new_tokens, 256)
        self._session_args = dict(
            language=language,
            max_stream_seconds=max_stream_seconds,
            max_new_tokens=max_new_tokens,
        )
        self.rollover_overlap = int(rollover_overlap_s * sample_rate)
        self.session = StreamingSession(engine, **self._session_args)
        self._since_update = 0
        # feed() appends here (O(chunk)); buffers concatenate once per
        # update — per-call np.concatenate made ingest O(session^2)
        self._pending: list[np.ndarray] = []
        self._pending_len = 0
        self._hypotheses: list[str] = []
        self._rolled = ""       # text committed by completed sessions
        self._committed = ""    # total committed text (incl. rolled)
        self._overlap_carried = False  # rolled text overlaps session head
        self._last_result: Optional[TranscribeResult] = None

    @property
    def committed_text(self) -> str:
        return self._committed

    def feed(self, samples: np.ndarray) -> Optional[StreamUpdate]:
        """Add audio; returns an update when a re-transcription ran."""
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._pending.append(samples)
        self._pending_len += len(samples)
        self._since_update += len(samples)
        if self._since_update < self.update_interval:
            return None
        self._since_update = 0
        self._flush()
        return self._update()

    def _flush(self) -> None:
        if self._pending:
            self.session.buffer = np.concatenate(
                [self.session.buffer, *self._pending]
            )
            self._pending = []
            self._pending_len = 0

    def _seconds(self) -> float:
        return (
            len(self.session.buffer) + self._pending_len
        ) / self.sample_rate

    def _join(self, text: str) -> str:
        """Rolled text + current-session text.

        After a rollover the new session's buffer STARTS with
        ``rollover_overlap`` seconds already covered by the rolled text,
        so the junction is stitched (longform.best_join) instead of
        concatenated — boundary words appear exactly once, unmangled.
        """
        if not self._rolled:
            return text
        if self._overlap_carried and text:
            from .longform import stitch

            return stitch([self._rolled, text])
        return self._rolled + text

    def _update(self) -> StreamUpdate:
        if len(self.session.buffer) < N_FFT:
            return StreamUpdate("", self._committed, self._seconds())
        prev_committed = self._committed
        newly_rolled = ""
        # Roll over BEFORE updating when the buffer exceeds capacity:
        # an oversized update would prefill past the KV slab (XLA clamps
        # the writes silently -> garbage that rollover would then commit
        # permanently). Loops for feeds larger than a whole session.
        while len(self.session.buffer) > self.session.max_samples:
            buf = self.session.buffer
            ws = self.session.window_samples
            cut = (self.session.max_samples // ws) * ws
            if cut <= 0:
                cut = self.session.max_samples
            remainder = buf[cut:]
            self.session.buffer = buf[:cut]
            logger.info(
                "stream: session capacity reached; rolling over with "
                "%.1fs overlap", self.rollover_overlap / self.sample_rate,
            )
            final = self.session.update()
            hyp = self._join(final.text)
            self._rolled = hyp
            self._committed = hyp
            self._hypotheses = []
            overlap = buf[max(0, cut - self.rollover_overlap):cut]
            if len(overlap) >= cut:
                # degenerate tiny session: carrying the whole session
                # forward would never shrink the buffer
                overlap = overlap[:0]
            self._overlap_carried = len(overlap) > 0
            self.session = StreamingSession(
                self.engine, **self._session_args
            )
            self.session.buffer = np.concatenate([overlap, remainder])
        if len(self._committed) > len(prev_committed):
            newly_rolled = self._committed[len(prev_committed):]

        if len(self.session.buffer) < N_FFT:
            return StreamUpdate(
                newly_rolled, self._committed, self._seconds()
            )
        result = self.session.update()
        self._last_result = result
        hyp = self._join(result.text)
        self._hypotheses.append(hyp)

        newly = newly_rolled
        if len(self._hypotheses) >= self.agreement:
            window = self._hypotheses[-self.agreement:]
            stable = common_prefix_len(window)
            if stable > len(self._committed):
                newly += self._hypotheses[-1][len(self._committed):stable]
                self._committed = self._hypotheses[-1][:stable]
        logger.debug(
            "stream update: %.1fs audio, hyp %r, committed %r",
            self._seconds(), hyp, self._committed,
        )
        return StreamUpdate(
            committed=newly,
            hypothesis=hyp,
            audio_seconds=self._seconds(),
        )

    def finalize(self) -> TranscribeResult:
        """Final full-quality (exact-within-session) pass."""
        self._flush()
        buffer = self.session.buffer
        if len(buffer) < N_FFT:
            return TranscribeResult(
                text=self._committed, language="unknown", raw_output=""
            )
        if len(buffer) <= self.engine.max_bucket_seconds * self.sample_rate:
            result = self.engine.transcribe_samples(buffer, self.language)
        else:
            from .longform import transcribe_long

            result = transcribe_long(self.engine, buffer, self.language)
        if self._rolled:
            result = TranscribeResult(
                text=self._join(result.text),
                language=result.language,
                raw_output=result.raw_output,
            )
        self._committed = result.text
        self._last_result = result
        return result
