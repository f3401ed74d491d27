"""AsrEngine — the end-to-end inference runtime.

One utterance = ONE device dispatch. The whole pipeline — log-mel, audio
encoder, prompt-embedding injection, prefill, and the greedy decode loop —
is a single jit-compiled graph per (audio-length bucket), with the decode
loop running on device under `lax.while_loop`. The host syncs exactly once
per utterance, when the generated token buffer is fetched.

This is the TPU-native replacement for the reference's per-token
host-roundtrip loop (src/inference.rs:160-200, which reads back the argmax
scalar every step) and its per-call CPU MRoPE + mask rebuilds.

Shape bucketing: audio lengths are rounded up to a small set of chunk
counts so the number of compiled graphs stays bounded; all dynamic
quantities inside a bucket (true frame count, true prompt length) are
traced scalars.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import time
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.load import load_audio
from ..config import AsrConfig
from ..features.mel import (
    LogMelFrontend,
    log_mel_from_padded,
    num_mel_frames,
    pad_waveform,
)
from ..models.audio_encoder import AudioEncoder
from ..models.text_decoder import KVCache, TextDecoder
from ..tokenizer import (
    AsrTokenizer,
    ENDOFTEXT_TOKEN_ID,
    IM_END_TOKEN_ID,
)
from ..weights.loader import load_model_params
from .prompt import AUDIO_OFFSET, build_prompt, parse_asr_output

logger = logging.getLogger(__name__)

# Audio-length buckets in encoder chunks (1 chunk == 1 s of audio).
DEFAULT_CHUNK_BUCKETS = (1, 2, 4, 8, 15, 30, 60, 120, 240, 360)

# Prompt-length allowance beyond the audio tokens: header(9) + tail(6)
# + forced-language tokens (a handful). Rounded up for alignment.
PROMPT_SLACK = 32


@dataclasses.dataclass
class TranscribeResult:
    text: str
    language: str
    raw_output: str


class AsrEngine:
    """Loads a Qwen3-ASR checkpoint and transcribes audio files."""

    def __init__(
        self,
        model_dir: str | Path,
        dtype=jnp.bfloat16,
        max_new_tokens: int = 4096,
        chunk_buckets: Sequence[int] = DEFAULT_CHUNK_BUCKETS,
        config: Optional[AsrConfig] = None,
        params: Optional[tuple] = None,
        tokenizer: Optional[AsrTokenizer] = None,
    ):
        model_dir = Path(model_dir) if model_dir is not None else None
        if config is None:
            config = AsrConfig.from_file(model_dir / "config.json")
        self.config = config
        self.dtype = dtype
        self.max_new_tokens = max_new_tokens
        self.chunk_buckets = tuple(sorted(chunk_buckets))

        if params is None:
            logger.info("Loading weights from %s", model_dir)
            t0 = time.monotonic()
            params = load_model_params(model_dir, config, dtype)
            logger.info("Weights loaded in %.1fs", time.monotonic() - t0)
        self.enc_params, self.dec_params = params

        if tokenizer is None:
            tokenizer = AsrTokenizer.from_dir(model_dir)
        self.tokenizer = tokenizer

        self.frontend = LogMelFrontend(
            n_fft=400, hop_length=160,
            num_mel_bins=config.audio.num_mel_bins, sample_rate=16000,
        )
        self.encoder = AudioEncoder(config.audio)
        max_pos = 16
        for c in self.chunk_buckets:
            max_pos = max(max_pos, self._prompt_bucket(c) + max_new_tokens + 8)
        self.decoder = TextDecoder(config.text, max_position=max_pos)
        self._graphs = {}

    # ------------------------------------------------------------------ #

    def _prompt_bucket(self, num_chunks: int) -> int:
        tpc = self.config.audio.tokens_per_chunk
        p = AUDIO_OFFSET + num_chunks * tpc + PROMPT_SLACK
        return -(-p // 16) * 16

    def _pick_bucket(self, n_frames: int) -> int:
        cf = self.config.audio.chunk_frames
        chunks_needed = -(-n_frames // cf)
        for c in self.chunk_buckets:
            if c >= chunks_needed:
                return c
        raise ValueError(
            f"audio needs {chunks_needed} chunks, exceeding the largest "
            f"bucket {self.chunk_buckets[-1]}; use transcribe() which "
            f"segments long audio"
        )

    @property
    def max_bucket_seconds(self) -> float:
        cf = self.config.audio.chunk_frames
        return self.chunk_buckets[-1] * cf * 160 / 16000

    # ------------------------------------------------------------------ #
    # the fused per-bucket graph

    def _graph(self, num_chunks: int):
        key = num_chunks
        if key not in self._graphs:
            self._graphs[key] = jax.jit(
                functools.partial(self._transcribe_graph, num_chunks),
                static_argnums=(),
                donate_argnums=(),
            )
        return self._graphs[key]

    def _transcribe_graph(
        self,
        num_chunks: int,  # static (bound via partial)
        enc_params,
        dec_params,
        wave,            # (num_chunks*chunk_frames*160 + 400,) f32
        n_true_frames,   # scalar int32
        token_ids,       # (P,) int32, zero-padded past true_len
        true_len,        # scalar int32
    ):
        cfg = self.config
        mel = log_mel_from_padded(
            wave, n_true_frames, self.frontend.mel_filters,
            self.frontend.window,
        )
        audio_embeds, n_audio = self.encoder(enc_params, mel, n_true_frames)

        # --- prompt embedding with audio injection (src/inference.rs:110-124
        # does this with a host loop of slice_scatters; here it's one select)
        p = token_ids.shape[0]
        tok_embeds = self.decoder.embed(dec_params, token_ids)  # (P, H)
        hidden_dim = tok_embeds.shape[-1]
        # audio embedding for prompt position i lives at audio_embeds[i - 9]
        shifted = jnp.zeros((p, hidden_dim), tok_embeds.dtype)
        n_copy = min(audio_embeds.shape[0], p - AUDIO_OFFSET)
        shifted = jax.lax.dynamic_update_slice(
            shifted,
            audio_embeds[:n_copy].astype(tok_embeds.dtype),
            (AUDIO_OFFSET, 0),
        )
        pos = jnp.arange(p)
        is_audio = (pos >= AUDIO_OFFSET) & (pos < AUDIO_OFFSET + n_audio)
        hidden = jnp.where(is_audio[:, None], shifted, tok_embeds)[None]

        # --- prefill
        s_max = p + self.max_new_tokens + 1
        cache = KVCache.zeros(cfg.text, 1, s_max, dtype=self.dtype)
        logits, cache = self.decoder.prefill(
            dec_params, hidden, pos, cache, true_len
        )

        # --- greedy decode loop, fully on device
        max_new = self.max_new_tokens
        out_buf = jnp.zeros((max_new,), jnp.int32)

        def cond(state):
            _, _, n_gen, done, _ = state
            return jnp.logical_and(~done, n_gen < max_new)

        def body(state):
            cache, logits, n_gen, done, out_buf = state
            tok = jnp.argmax(logits[0]).astype(jnp.int32)
            is_eos = jnp.logical_or(
                tok == ENDOFTEXT_TOKEN_ID, tok == IM_END_TOKEN_ID
            )
            out_buf = jnp.where(
                is_eos, out_buf, out_buf.at[n_gen].set(tok)
            )
            new_n_gen = jnp.where(is_eos, n_gen, n_gen + 1)
            logits, cache = self.decoder.decode_step(
                dec_params, tok[None], true_len + n_gen, cache
            )
            return cache, logits, new_n_gen, is_eos, out_buf

        state = (cache, logits, jnp.int32(0), jnp.bool_(False), out_buf)
        _, _, n_gen, _, out_buf = jax.lax.while_loop(cond, body, state)
        return out_buf, n_gen

    # ------------------------------------------------------------------ #

    def transcribe_samples(
        self,
        samples: np.ndarray,
        language: Optional[str] = None,
    ) -> TranscribeResult:
        """Transcribe mono 16 kHz f32 samples (single bucketed dispatch)."""
        cf = self.config.audio.chunk_frames
        tpc = self.config.audio.tokens_per_chunk

        n_frames = num_mel_frames(len(samples))
        bucket_chunks = self._pick_bucket(n_frames)
        bucket_frames = bucket_chunks * cf
        wave, n_true = pad_waveform(samples, bucket_frames=bucket_frames)
        logger.info("Mel spectrogram: %d frames (bucket %d chunks)",
                    n_true, bucket_chunks)

        # exact valid audio-token count (host mirror of encoder.valid_tokens)
        from ..config import feat_extract_output_length

        full = n_true // cf
        tail = n_true % cf
        n_audio = full * tpc + (
            feat_extract_output_length(tail) if tail else 0
        )
        logger.info("Audio encoder: %d tokens", n_audio)

        prompt = build_prompt(n_audio, language, self.tokenizer)
        true_len = len(prompt)
        p_bucket = self._prompt_bucket(bucket_chunks)
        if true_len > p_bucket:
            raise ValueError("prompt exceeds bucket; language string too long")
        token_ids = np.zeros(p_bucket, np.int32)
        token_ids[:true_len] = prompt

        graph = self._graph(bucket_chunks)
        out_buf, n_gen = graph(
            self.enc_params,
            self.dec_params,
            jnp.asarray(wave),
            jnp.int32(n_true),
            jnp.asarray(token_ids),
            jnp.int32(true_len),
        )
        n_gen = int(n_gen)
        generated = np.asarray(out_buf)[:n_gen].tolist()
        logger.info("Generated %d tokens", n_gen)

        raw = self.tokenizer.decode(generated)
        lang, text = parse_asr_output(raw, language is not None)
        return TranscribeResult(text=text, language=lang, raw_output=raw)

    def transcribe(
        self,
        audio_path: str | Path,
        language: Optional[str] = None,
        segment_seconds: Optional[float] = None,
    ) -> TranscribeResult:
        """Transcribe an audio file of any length.

        Audio longer than the largest bucket is split into segments that are
        transcribed sequentially and concatenated (long-form mode).
        """
        samples = load_audio(audio_path, 16000)
        max_seconds = segment_seconds or self.max_bucket_seconds
        max_samples = int(max_seconds * 16000)
        if len(samples) <= max_samples:
            return self.transcribe_samples(samples, language)

        logger.info(
            "Long-form audio (%.1fs): segmenting at %.0fs",
            len(samples) / 16000, max_seconds,
        )
        texts = []
        langs = []
        raws = []
        for start in range(0, len(samples), max_samples):
            seg = samples[start : start + max_samples]
            if len(seg) < 400:  # below one STFT window
                break
            r = self.transcribe_samples(seg, language)
            texts.append(r.text)
            langs.append(r.language)
            raws.append(r.raw_output)
        return TranscribeResult(
            text=" ".join(t for t in texts if t),
            language=langs[0] if langs else "unknown",
            raw_output="\n".join(raws),
        )
