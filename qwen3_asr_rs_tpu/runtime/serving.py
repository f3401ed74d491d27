"""Continuous batching — the TPU serving scheduler.

The offline engine's one-dispatch batch (engine.transcribe_batch) holds
every utterance until the WHOLE batch hits EOS, and admits nothing
mid-flight. This module replaces that with slot-based continuous
batching, the standard LLM-serving discipline, built TPU-natively:

  * a fixed pool of B decode slots shares one preallocated KV slab
    (static shapes: one compiled decode graph, ever);
  * decode runs in short jitted SEGMENTS of K steps; between segments the
    host observes per-slot done flags, returns finished requests
    immediately (per-example early return), and admits queued requests
    into free slots;
  * admission = a prefill dispatch (mel -> encoder -> inject -> decoder
    prefill) that writes each request's K/V block into its slot of the
    shared slab. Prefill attends only to its own fresh sequence, so
    slots are perfectly isolated. Same-bucket requests queued at the
    same scheduler step are admitted in ONE batched dispatch (padded to
    a power of two, so at most log2(max) graphs per bucket) — a burst
    of short clips pays one encoder+prefill round trip instead of N
    serialized ones (round 5; VERDICT: 32-slot bursts regressed to 93x
    behind serialized admission);
  * LONG prompts are admitted in CHUNKS (prefill_chunk_tokens): one
    encode+inject dispatch produces the hidden sequence, then bounded
    decoder.prefill_chunk dispatches (interleaved with decode segments)
    fill a per-admission temp cache, committed to the slab with one
    in-place write. A 2-minute clip therefore never stalls active
    decodes for more than ~one chunk's prefill between segments;
  * per-slot positions are independent (left-aligned at slab slot 0), so
    a 4 s clip never waits on a 120 s clip's decode, and each request
    carries its own max_new_tokens.

A finished slot's stale K/V needs no cleanup: the next admission's
prefill overwrites [0, P) and the decode mask only exposes [0, pos).

The reference has no serving path at all (single-process CLI,
src/main.rs); this exceeds it by design. Numerics match the offline
engine exactly — one request through the batcher emits the same tokens
as engine.transcribe_samples (pinned in tests/test_serving.py).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os
import queue
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import feat_extract_output_length
from ..features.mel import log_mel_from_padded, num_mel_frames, pad_waveform
from ..models.text_decoder import KVCache
from ..tokenizer import ENDOFTEXT_TOKEN_ID, IM_END_TOKEN_ID
from .engine import AsrEngine, TranscribeResult
from .prompt import AUDIO_OFFSET, build_prompt, parse_asr_output
from .sampling import sample_token

logger = logging.getLogger(__name__)

PAD_TOKEN = -1  # out-buffer filler (never a valid token id)


def _write_slot(slab: KVCache, tmp: KVCache, slot) -> KVCache:
    """Write a per-admission (B==1) cache into one slot of the shared
    slab (scales too when the pool is int8). tmp may be longer than the
    slab (chunked prefill pads the prompt to the chunk size) — the
    overhang holds no prompt positions and is dropped."""
    p_keep = min(tmp.k.shape[3], slab.k.shape[3])
    return KVCache(
        k=jax.lax.dynamic_update_slice(
            slab.k, tmp.k[:, :, :, :p_keep], (0, slot, 0, 0, 0)
        ),
        v=jax.lax.dynamic_update_slice(
            slab.v, tmp.v[:, :, :, :p_keep], (0, slot, 0, 0, 0)
        ),
        k_scale=(
            None if slab.k_scale is None
            else jax.lax.dynamic_update_slice(
                slab.k_scale, tmp.k_scale[:, :, :, :p_keep],
                (0, slot, 0, 0),
            )
        ),
        v_scale=(
            None if slab.v_scale is None
            else jax.lax.dynamic_update_slice(
                slab.v_scale, tmp.v_scale[:, :, :, :p_keep],
                (0, slot, 0, 0),
            )
        ),
    )


def _write_slot_rows(slab: KVCache, tmp: KVCache, slots) -> KVCache:
    """Write each row of a batched admission cache into its slab slot.

    ``slots`` is (n,) int32. Rows are written in order, so duplicate
    slot indices (batch padding replicates a real row, slot included)
    resolve to identical data regardless of order.
    """
    n = tmp.k.shape[1]
    p_keep = min(tmp.k.shape[3], slab.k.shape[3])
    tmp = KVCache(
        k=tmp.k[:, :, :, :p_keep],
        v=tmp.v[:, :, :, :p_keep],
        k_scale=None if tmp.k_scale is None else tmp.k_scale[:, :, :, :p_keep],
        v_scale=None if tmp.v_scale is None else tmp.v_scale[:, :, :, :p_keep],
    )

    def body(i, slab):
        row = KVCache(
            k=jax.lax.dynamic_slice_in_dim(tmp.k, i, 1, axis=1),
            v=jax.lax.dynamic_slice_in_dim(tmp.v, i, 1, axis=1),
            k_scale=(
                None if tmp.k_scale is None
                else jax.lax.dynamic_slice_in_dim(tmp.k_scale, i, 1, axis=1)
            ),
            v_scale=(
                None if tmp.v_scale is None
                else jax.lax.dynamic_slice_in_dim(tmp.v_scale, i, 1, axis=1)
            ),
        )
        return _write_slot(slab, row, slots[i])

    return jax.lax.fori_loop(0, n, body, slab)


class Request:
    """A queued transcription request (thread-safe completion handle).

    ``temperature`` > 0 switches this request's decode from greedy
    argmax to temperature sampling (runtime/sampling.py) — per SLOT:
    greedy and sampled requests share the same decode segments, each row
    taking its own path inside one compiled graph. 0 (default) is exact
    greedy. ``top_p`` < 1 adds a per-slot nucleus filter to a sampled
    request (ignored at temperature 0, like the OpenAI API): top_p is
    TRACED per-row state (runtime/sampling.py apply_top_p), so requests
    with different nucleus masses share one compiled segment variant —
    the full-vocab sort only exists in that variant, which compiles
    the first time a nucleus request is live. (top-k stays an
    offline-engine option: a static compile-time filter.)
    """

    def __init__(self, samples: np.ndarray, language: Optional[str] = None,
                 max_new_tokens: Optional[int] = None,
                 temperature: float = 0.0, top_p: float = 1.0):
        self.samples = np.asarray(samples, np.float32).reshape(-1)
        self.language = language
        self.max_new_tokens = max_new_tokens
        if temperature < 0:
            raise ValueError(
                f"temperature must be >= 0, got {temperature}"
            )
        if not 0.0 < top_p <= 1.0:
            raise ValueError(
                f"top_p must be in (0, 1], got {top_p}"
            )
        self.temperature = float(temperature)
        self.top_p = float(top_p)
        self.event = threading.Event()
        self.result: Optional[TranscribeResult] = None
        self.error: Optional[Exception] = None
        self.submit_time = time.monotonic()
        self.finish_time: Optional[float] = None

    def wait(self, timeout=None) -> TranscribeResult:
        if not self.event.wait(timeout):
            raise TimeoutError("request did not complete in time")
        if self.error is not None:
            raise self.error
        return self.result


@dataclasses.dataclass
class _Slot:
    request: Optional[Request] = None
    tokens: list = dataclasses.field(default_factory=list)
    max_new: int = 0

    @property
    def active(self) -> bool:
        return self.request is not None


@dataclasses.dataclass
class _PrefillJob:
    """In-progress chunked admission: hidden sequence + temp KV cache."""

    hidden: jax.Array      # (1, p_pad, H) injected embeddings
    tmp: KVCache           # (L, 1, Hkv, p_pad, D) per-admission cache
    prompt_len: int
    bucket: int
    cursor: int = 0
    tok0: int = 0


@dataclasses.dataclass
class _EncodeJob:
    """In-progress segmented ENCODE admission (before _PrefillJob).

    Long clips run the audio encoder one window-group per scheduler
    step (windows are independent by construction — block-diagonal
    attention), so even a 2-minute clip's encoder pass never stalls
    active decode slots for more than one group.
    """

    mel: jax.Array         # (n_mel, n_groups * group_frames), zero-padded
    embeds: jax.Array      # (n_chunks_padded * tpc, D) accumulator
    n_true: int
    ids: np.ndarray
    prompt_len: int
    bucket: int
    cursor: int = 0        # next window group
    n_groups: int = 0


class ContinuousBatcher:
    """Slot-based continuous batching over a shared KV slab."""

    def __init__(
        self,
        engine: AsrEngine,
        n_slots: int = 8,
        segment_steps: int = 8,
        max_new_tokens: Optional[int] = None,
        max_chunks: Optional[int] = None,
        prefill_chunk_tokens: Optional[int] = 256,
        encode_window_groups: Optional[int] = 2,
        serving_precision: str = "engine",
        kv_dtype: Optional[str] = None,
        admit_batch_max: int = 8,
    ):
        self.engine = engine
        # Mesh serving: the slot pool shards across the mesh — slab and
        # slot-state arrays carry NamedShardings ('dp' on the slot dim,
        # 'tp' on KV heads when tensor-parallel) and GSPMD partitions
        # the segment graph, so decode throughput scales with devices.
        # The per-request admission graphs stay replicated (one-off
        # cost per request; decode segments dominate at occupancy).
        self.mesh = getattr(engine, "mesh", None)
        if self.mesh is not None and all(
            self.mesh.shape.get(ax, 1) == 1 for ax in ("dp", "tp")
        ):
            self.mesh = None
        if self.mesh is not None:
            dp = self.mesh.shape.get("dp", 1)
            n_slots = -(-n_slots // dp) * dp  # dp must divide the pool
        self.n_slots = n_slots
        self.segment_steps = segment_steps
        # Prompts longer than this are prefilled in chunks interleaved
        # with decode segments (None = always one monolithic dispatch).
        self.prefill_chunk_tokens = prefill_chunk_tokens
        # Clips spanning more than this many encoder windows are encoded
        # one group of this many windows per step (None = inline encode).
        self.encode_window_groups = encode_window_groups
        if max_new_tokens is None:
            max_new_tokens = min(engine.max_new_tokens, 512)
        self.max_new = max_new_tokens
        # Per-segment decode precision. Weight-only int8 wins when few
        # slots decode (the segment is weight-stream-bound: half the
        # bytes), bf16 wins once the batch amortizes the weight stream
        # and the int8 dequant VPU work lands on the critical path
        # (measured round 2f: batch-8 aggregate 203x bf16 vs 134x int8;
        # single-stream 0.96 ms/token int8 vs 1.74 bf16). "auto" keeps
        # BOTH param sets resident and picks per segment by live-slot
        # occupancy against ASR_SERVING_INT8_MAX_OCC (default 2;
        # measure the real crossover with scripts/bench_serving.py).
        # "engine" (default) always uses the engine's own params.
        import os

        if serving_precision not in ("engine", "auto", "bf16", "int8"):
            raise ValueError(
                f"unknown serving_precision {serving_precision!r}"
            )
        self.serving_precision = serving_precision
        self.int8_max_occupancy = int(
            os.environ.get("ASR_SERVING_INT8_MAX_OCC", "2")
        )
        self._params_by_precision = {"engine": engine.dec_params}
        if serving_precision != "engine":
            from ..weights.quantize import (
                is_quantized,
                quant_bits,
                quantize_decoder_params,
            )

            if is_quantized(engine.dec_params):
                if serving_precision in ("auto", "bf16") or quant_bits(
                    engine.dec_params
                ) != 8:
                    raise ValueError(
                        "serving_precision needs an UNQUANTIZED engine "
                        "(the batcher derives its own int8 copy); build "
                        "the engine without quantize="
                    )
                self._params_by_precision["int8"] = engine.dec_params
            else:
                self._params_by_precision["bf16"] = engine.dec_params
                if serving_precision in ("auto", "int8"):
                    mesh_tp = (
                        engine.mesh.shape.get("tp", 1)
                        if engine.mesh is not None else 1
                    )
                    # lm_bits pinned to 8: the serving auto-select
                    # tables were measured with an int8 lm_head, and an
                    # ambient ASR_LM_BITS=4 would otherwise leak in
                    q8 = quantize_decoder_params(
                        engine.dec_params, merge=mesh_tp == 1, lm_bits=8
                    )
                    if "lm_fold_w" in engine.dec_params:
                        # the engine folds (ASR_FOLD_LM=1): re-prepare
                        # the padded operands from the int8 lm_head —
                        # quantize strips the stale bf16 ones, and an
                        # unprepared fold puts a per-token lm_head copy
                        # back into every decode segment
                        from ..ops.pallas.decode_layer import (
                            prepare_lm_fold,
                        )

                        w, s = prepare_lm_fold(
                            q8["lm_head_q"], q8.get("lm_head_s")
                        )
                        q8["lm_fold_w"] = w
                        q8["lm_fold_s"] = s
                    self._params_by_precision["int8"] = q8
        if max_chunks is None:
            # default: cap serving admission at 2 min of audio, but never
            # below the smallest bucket (long-form-only engines)
            max_chunks = max(
                min(engine.chunk_buckets[-1], 120), engine.chunk_buckets[0]
            )
        if max_chunks < engine.chunk_buckets[0]:
            # every request would be rejected as oversized (and warmup
            # would have no bucket to drive)
            raise ValueError(
                f"max_chunks={max_chunks} is below the smallest engine "
                f"bucket {engine.chunk_buckets[0]}; no request can be "
                f"admitted"
            )
        self.max_chunks = max_chunks

        cfg = engine.config
        # int8 KV slab (opt-in, or inherited from the engine's ASR_KV):
        # HALF the per-segment slab stream and 2x decode slots per HBM
        # byte — the s_max * n_slots slab is the serving pool's dominant
        # allocation, so a given memory budget holds twice the slots.
        # Per-(layer, slot, head, position) scales; prefill/commit write
        # quantized, decode dequantizes at the attention site.
        if kv_dtype is None:
            kv_dtype = "int8" if getattr(engine, "kv_quant", False) else \
                "bf16"
        if kv_dtype not in ("bf16", "int8"):
            raise ValueError(f"unknown kv_dtype {kv_dtype!r}")
        if kv_dtype == "int8" and self.mesh is not None and \
                self.mesh.shape.get("tp", 1) > 1:
            raise ValueError(
                "kv_dtype='int8' serving is not supported under tensor "
                "parallelism (works on dp-only meshes)"
            )
        self.kv_quant = kv_dtype == "int8"
        # Headroom covers pipelining overshoot: a slot that reaches
        # max_new while a segment is already in flight keeps writing for
        # up to one more segment, so size it by segment_steps (min 8),
        # not the default segment length.
        self.s_max = (
            engine._prompt_bucket(max_chunks)
            + max_new_tokens
            + max(8, segment_steps)
        )
        # aligned to the decode kernels' DMA clamp unit (Mosaic slice-
        # alignment proof): 8 for bf16 k/v sublane slices, 128 for the
        # int8-KV scale slabs' lane slices
        _align = 128 if self.kv_quant else 8
        self.s_max = -(-self.s_max // _align) * _align
        self.cache = KVCache.zeros(
            cfg.text, n_slots, self.s_max, dtype=engine.dtype,
            quantized=self.kv_quant,
        )
        self.slots = [_Slot() for _ in range(n_slots)]
        # Device-RESIDENT decode state: the segment graph's source of
        # truth. Segments are PIPELINED — segment k+1 is dispatched
        # before segment k's outputs are fetched, so the host round-trip
        # (~28 ms through a tunneled transport) overlaps device compute.
        self.d_tok = jnp.zeros(n_slots, jnp.int32)
        self.d_pos = jnp.zeros(n_slots, jnp.int32)
        self.d_done = jnp.ones(n_slots, bool)
        # per-slot sampling temperature (0 = greedy row) + the pool's
        # PRNG key chain: the sampling segment graph splits the key once
        # per step and returns the new chain head. Admission tok0 keys
        # derive from the base key + a host counter.
        self.d_temp = jnp.zeros(n_slots, jnp.float32)
        # per-slot nucleus mass (1 = no filter; only read by the
        # nucleus segment variant, see _segment_graph)
        self.d_topp = jnp.ones(n_slots, jnp.float32)
        self._base_key = jax.random.PRNGKey(
            int(os.environ.get("ASR_SAMPLING_SEED", "0"))
        )
        self.d_key = self._base_key
        self._admit_seq = 0
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            tp_ok = (
                cfg.text.num_key_value_heads
                % self.mesh.shape.get("tp", 1) == 0
            )
            slab = NamedSharding(
                self.mesh,
                P(None, "dp", "tp" if tp_ok else None, None, None),
            )
            scale_s = NamedSharding(
                self.mesh, P(None, "dp", "tp" if tp_ok else None, None)
            )
            slot_s = NamedSharding(self.mesh, P("dp"))
            self.cache = KVCache(
                k=jax.device_put(self.cache.k, slab),
                v=jax.device_put(self.cache.v, slab),
                k_scale=(
                    None if self.cache.k_scale is None
                    else jax.device_put(self.cache.k_scale, scale_s)
                ),
                v_scale=(
                    None if self.cache.v_scale is None
                    else jax.device_put(self.cache.v_scale, scale_s)
                ),
            )
            self.d_tok = jax.device_put(self.d_tok, slot_s)
            self.d_pos = jax.device_put(self.d_pos, slot_s)
            self.d_done = jax.device_put(self.d_done, slot_s)
            self.d_temp = jax.device_put(self.d_temp, slot_s)
            self.d_topp = jax.device_put(self.d_topp, slot_s)
            logger.info(
                "serving slot pool sharded over mesh %s (%d slots)",
                dict(self.mesh.shape), n_slots,
            )
        # host mirrors for scheduling decisions (lag by one segment)
        self.tok = np.zeros(n_slots, np.int32)
        self.pos = np.zeros(n_slots, np.int32)
        self.done = np.ones(n_slots, bool)
        # admissions/finishes bump a slot's version; a drained segment
        # only applies to slots whose version matches its dispatch
        self._slot_version = np.zeros(n_slots, np.int64)
        self._inflight = None
        self._setstate_jit = None

        # Batched admission: same-bucket monolithic admissions queued at
        # one scheduler step coalesce into ONE dispatch of up to this
        # many requests (power-of-two padded; <= 1 disables). Chunked
        # (long-prompt) admissions always go through their own path.
        self.admit_batch_max = max(1, int(admit_batch_max))

        self.queue: "queue.Queue[Request]" = queue.Queue()
        self.prefilling: dict[int, _PrefillJob] = {}
        self.encoding: dict[int, _EncodeJob] = {}
        self._batch_prefill_jit = {}
        self._prefill_jit = {}
        self._encode_jit = {}
        self._mel_jit = {}
        self._egroup_jit = {}
        self._inject_jit = {}
        self._chunk_jit = {}
        self._commit_jit = {}
        self._segment = {}

    def _group_chunks(self, bucket: int) -> int:
        """Chunks per encode group (whole windows only)."""
        cpw = min(self.engine.config.audio.chunks_per_window, bucket)
        return cpw * (self.encode_window_groups or 1)

    # -------------------------------------------------------------- #
    # device graphs

    def _prefill_graph(self, num_chunks: int):
        """Per-audio-bucket prefill writing into one slab slot (B == 1).

        Mirrors the offline engine's left-aligned single-utterance path
        (engine._transcribe_graph) so tokens match it exactly.
        """
        if num_chunks in self._prefill_jit:
            return self._prefill_jit[num_chunks]
        engine = self.engine
        cfg = engine.config

        def fn(enc_params, dec_params, wave, n_true, token_ids, true_len,
               slab, slot, temp, topp, key):
            hidden = self._inject(
                enc_params, dec_params, wave, n_true, token_ids
            )
            p = token_ids.shape[0]
            slots_ax = jnp.arange(p)
            tmp = KVCache.zeros(
                cfg.text, 1, p, dtype=engine.dtype,
                quantized=slab.quantized,
            )
            logits, tmp = engine.decoder.prefill(
                dec_params, hidden, slots_ax, tmp, true_len
            )
            slab = _write_slot(slab, tmp, slot)
            # temp == 0 takes the argmax branch inside sample_token, so
            # greedy admissions are tokenwise identical to before.
            # Deliberately UNGATED (unlike _segment_graph's static
            # variant key): gating would multiply the per-bucket prefill
            # graph compiles, to save one (1, V) Gumbel draw and one
            # (1, V) sort (traced topp) per ADMISSION (~us next to the
            # encoder+prefill in the same dispatch) — decode segments
            # run per step, admission runs once per request.
            tok0 = sample_token(logits, key, temp, top_p=topp)[0]
            return tok0, slab

        self._prefill_jit[num_chunks] = jax.jit(fn, donate_argnums=(6,))
        return self._prefill_jit[num_chunks]

    def _batched_prefill_graph(self, num_chunks: int, n: int):
        """Batched admission: n same-bucket requests in ONE dispatch.

        mel/encode vmap over the batch (the encoder batches on the MXU
        instead of paying n serialized dispatch round trips), one
        left-aligned decoder prefill with per-row true lengths, then a
        sequential per-row slab write (duplicate padding slots carry
        identical data, so write order is irrelevant). Row b's slab
        content and first token are bitwise what the per-request
        monolithic graph produces (pinned in tests/test_serving.py).
        """
        key = (num_chunks, n)
        if key in self._batch_prefill_jit:
            return self._batch_prefill_jit[key]
        engine = self.engine
        cfg = engine.config

        def fn(enc_params, dec_params, waves, n_trues, token_ids,
               true_lens, slab, slot_ids, temps, topps, key):
            mel = jax.vmap(
                lambda w, t: log_mel_from_padded(
                    w, t, engine.frontend.mel_filters
                )
            )(waves, n_trues)
            audio_embeds, n_audio = jax.vmap(
                engine.encoder, in_axes=(None, 0, 0)
            )(enc_params, mel, n_trues)  # (n, C*tpc, H), (n,)

            p = token_ids.shape[1]
            tok_embeds = engine.decoder.embed(dec_params, token_ids)
            slots_ax = jnp.arange(p)
            shifted = jnp.zeros(
                (n, p, tok_embeds.shape[-1]), tok_embeds.dtype
            )
            n_copy = min(audio_embeds.shape[1], p - AUDIO_OFFSET)
            shifted = jax.lax.dynamic_update_slice(
                shifted,
                audio_embeds[:, :n_copy].astype(tok_embeds.dtype),
                (0, AUDIO_OFFSET, 0),
            )
            is_audio = (slots_ax[None, :] >= AUDIO_OFFSET) & (
                slots_ax[None, :] < AUDIO_OFFSET + n_audio[:, None]
            )
            hidden = jnp.where(is_audio[..., None], shifted, tok_embeds)

            tmp = KVCache.zeros(
                cfg.text, n, p, dtype=engine.dtype,
                quantized=slab.quantized,
            )
            logits, tmp = engine.decoder.prefill(
                dec_params, hidden, slots_ax, tmp, true_lens
            )  # logits (n, V)
            slab = _write_slot_rows(slab, tmp, slot_ids)
            # one key covers the batch: categorical draws Gumbel noise
            # of logits.shape, so rows are independent; temp==0 rows
            # take the argmax branch (greedy parity with the
            # per-request graph); topps is a per-row traced vector
            tok0 = sample_token(logits, key, temps, top_p=topps)
            return tok0, slab

        self._batch_prefill_jit[key] = jax.jit(fn, donate_argnums=(6,))
        return self._batch_prefill_jit[key]

    def _inject(self, enc_params, dec_params, wave, n_true, token_ids):
        """mel -> encoder -> token embeddings with audio injection.

        Returns hidden (1, P, H); shared by the monolithic and chunked
        admission graphs (mirrors engine._transcribe_graph injection).
        """
        engine = self.engine
        mel = log_mel_from_padded(wave, n_true, engine.frontend.mel_filters)
        audio_embeds, n_audio = engine.encoder(enc_params, mel, n_true)

        tok_embeds = engine.decoder.embed(dec_params, token_ids[None])
        p = token_ids.shape[0]
        hidden_dim = tok_embeds.shape[-1]
        slots_ax = jnp.arange(p)
        shifted = jnp.zeros((1, p, hidden_dim), tok_embeds.dtype)
        n_copy = min(audio_embeds.shape[0], p - AUDIO_OFFSET)
        shifted = jax.lax.dynamic_update_slice(
            shifted,
            audio_embeds[None, :n_copy].astype(tok_embeds.dtype),
            (0, AUDIO_OFFSET, 0),
        )
        is_audio = (slots_ax >= AUDIO_OFFSET) & (
            slots_ax < AUDIO_OFFSET + n_audio
        )
        return jnp.where(is_audio[None, :, None], shifted, tok_embeds)

    def _encode_graph(self, num_chunks: int):
        """Chunked-admission stage 1: encode + inject, padded so prefill
        chunks of ``prefill_chunk_tokens`` tile the sequence exactly."""
        if num_chunks in self._encode_jit:
            return self._encode_jit[num_chunks]
        engine = self.engine
        c = self.prefill_chunk_tokens
        p_bucket = engine._prompt_bucket(num_chunks)
        p_pad = -(-p_bucket // c) * c

        def fn(enc_params, dec_params, wave, n_true, token_ids):
            hidden = self._inject(
                enc_params, dec_params, wave, n_true, token_ids
            )
            return jnp.pad(hidden, ((0, 0), (0, p_pad - p_bucket), (0, 0)))

        self._encode_jit[num_chunks] = jax.jit(fn)
        return self._encode_jit[num_chunks]

    def _mel_graph(self, bucket: int):
        """Segmented-encode stage 0: wave -> mel, zero-padded so encode
        groups of whole windows tile the frame axis exactly."""
        if bucket in self._mel_jit:
            return self._mel_jit[bucket]
        engine = self.engine
        cf = engine.config.audio.chunk_frames
        gchunks = self._group_chunks(bucket)
        n_groups = -(-bucket // gchunks)
        pad = (n_groups * gchunks - bucket) * cf

        def fn(wave, n_true):
            mel = log_mel_from_padded(
                wave, n_true, engine.frontend.mel_filters
            )
            return jnp.pad(mel, ((0, 0), (0, pad)))

        self._mel_jit[bucket] = jax.jit(fn)
        return self._mel_jit[bucket]

    def _encode_group_graph(self, bucket: int):
        """Segmented-encode stage 1: ONE window group through the audio
        encoder, written at its offset of the embeds accumulator.

        Exactly equals the full-clip encode restricted to those windows:
        windows attend block-diagonally (independent), the conv stem and
        positional embedding are chunk-local, and valid-token counting
        is per chunk.
        """
        if bucket in self._egroup_jit:
            return self._egroup_jit[bucket]
        engine = self.engine
        cfg = engine.config.audio
        gchunks = self._group_chunks(bucket)
        gframes = gchunks * cfg.chunk_frames
        tpc = cfg.tokens_per_chunk

        def fn(enc_params, mel, n_true, g, buf):
            mel_g = jax.lax.dynamic_slice(
                mel, (0, g * gframes), (mel.shape[0], gframes)
            )
            n_true_g = jnp.clip(n_true - g * gframes, 0, gframes)
            embeds, _ = engine.encoder(enc_params, mel_g, n_true_g)
            return jax.lax.dynamic_update_slice(
                buf, embeds.astype(buf.dtype), (g * gchunks * tpc, 0)
            )

        self._egroup_jit[bucket] = jax.jit(fn, donate_argnums=(4,))
        return self._egroup_jit[bucket]

    def _inject_graph(self, bucket: int):
        """Segmented-encode stage 2: audio embeds + prompt ids -> padded
        hidden (the injection half of _inject)."""
        if bucket in self._inject_jit:
            return self._inject_jit[bucket]
        engine = self.engine
        c = self.prefill_chunk_tokens
        p_bucket = engine._prompt_bucket(bucket)
        p_pad = -(-p_bucket // c) * c

        def fn(dec_params, embeds, n_true, token_ids):
            n_audio = engine.encoder.valid_tokens(n_true)
            tok_embeds = engine.decoder.embed(dec_params, token_ids[None])
            p = token_ids.shape[0]
            slots_ax = jnp.arange(p)
            shifted = jnp.zeros(
                (1, p, tok_embeds.shape[-1]), tok_embeds.dtype
            )
            n_copy = min(embeds.shape[0], p - AUDIO_OFFSET)
            shifted = jax.lax.dynamic_update_slice(
                shifted,
                embeds[None, :n_copy].astype(tok_embeds.dtype),
                (0, AUDIO_OFFSET, 0),
            )
            is_audio = (slots_ax >= AUDIO_OFFSET) & (
                slots_ax < AUDIO_OFFSET + n_audio
            )
            hidden = jnp.where(is_audio[None, :, None], shifted, tok_embeds)
            return jnp.pad(hidden, ((0, 0), (0, p_pad - p_bucket), (0, 0)))

        self._inject_jit[bucket] = jax.jit(fn)
        return self._inject_jit[bucket]

    def _chunk_fn(self):
        """Chunked-admission stage 2: ONE bounded prefill chunk into the
        per-admission temp cache (decoder.prefill_chunk semantics). The
        returned token is only meaningful on the chunk containing the
        prompt's last position."""
        if self._chunk_jit.get("fn") is None:
            engine = self.engine
            c = self.prefill_chunk_tokens

            def fn(dec_params, hidden, start, tmp, true_in_chunk, temp,
                   topp, key):
                chunk = jax.lax.dynamic_slice(
                    hidden, (0, start, 0), (1, c, hidden.shape[-1])
                )
                logits, tmp = engine.decoder.prefill_chunk(
                    dec_params, chunk, start, tmp, true_in_chunk,
                )
                tok0 = sample_token(logits, key, temp, top_p=topp)[0]
                return tok0, tmp

            self._chunk_jit["fn"] = jax.jit(fn, donate_argnums=(3,))
        return self._chunk_jit["fn"]

    def _commit_fn(self):
        """Chunked-admission stage 3: one in-place write of the finished
        temp cache into the slot's region of the shared slab."""
        if self._commit_jit.get("fn") is None:

            def fn(tmp, slab, slot):
                return _write_slot(slab, tmp, slot)

            self._commit_jit["fn"] = jax.jit(fn, donate_argnums=(1,))
        return self._commit_jit["fn"]

    def _segment_graph(self, variant: str):
        """K decode steps over all slots with per-slot positions.

        Three variants with one signature, so the expensive machinery
        only exists in graphs that need it:

        * ``"greedy"`` — compiled when every live slot decodes greedily:
          argmax, ``temp``/``topp``/``key`` pass through untouched, so
          all-greedy serving pays zero sampling overhead;
        * ``"sample"`` — one fresh key per step; each ROW picks argmax
          (temperature 0) or a temperature sample inside the same
          program, so mixed batches share segments;
        * ``"nucleus"`` — the sample graph plus the per-row traced
          ``topp`` filter (runtime/sampling.py apply_top_p). The
          full-vocab sort lives only here and rows at top_p == 1 keep
          every token, so it compiles once and serves any mix of
          greedy / temperature / nucleus requests.
        """
        if variant in self._segment:
            return self._segment[variant]
        engine = self.engine
        k_steps = self.segment_steps

        def fn(dec_params, cache, tok, pos, done, temp, topp, key):
            out = jnp.full((self.n_slots, k_steps), PAD_TOKEN, jnp.int32)

            def body(i, state):
                cache, tok, pos, done, out, key = state
                is_eos = jnp.logical_or(
                    tok == ENDOFTEXT_TOKEN_ID, tok == IM_END_TOKEN_ID
                )
                done = jnp.logical_or(done, is_eos)
                out = out.at[:, i].set(jnp.where(done, PAD_TOKEN, tok))
                logits, cache = engine.decoder.decode_step(
                    dec_params, tok, pos, cache
                )
                if variant == "nucleus":
                    key, sub = jax.random.split(key)
                    ntok = sample_token(logits, sub, temp, top_p=topp)
                elif variant == "sample":
                    key, sub = jax.random.split(key)
                    ntok = sample_token(logits, sub, temp)
                else:
                    ntok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                tok = jnp.where(done, tok, ntok)
                pos = jnp.where(done, pos, pos + 1)
                return cache, tok, pos, done, out, key

            cache, tok, pos, done, out, key = jax.lax.fori_loop(
                0, k_steps, body, (cache, tok, pos, done, out, key)
            )
            return tok, pos, done, out, cache, key

        self._segment[variant] = jax.jit(fn, donate_argnums=(1,))
        return self._segment[variant]

    # -------------------------------------------------------------- #
    # host scheduling

    def submit(self, req: Request) -> None:
        n_frames = num_mel_frames(len(req.samples))
        cf = self.engine.config.audio.chunk_frames
        if -(-n_frames // cf) > self.max_chunks:
            raise ValueError(
                f"audio needs {-(-n_frames // cf)} chunks, exceeding the "
                f"server's {self.max_chunks}-chunk slots; use the offline "
                f"engine's long-form path"
            )
        self.queue.put(req)

    def _prepare(self, req: Request):
        """Host-side admission prep: bucket, padded wave, prompt ids."""
        engine = self.engine
        cf = engine.config.audio.chunk_frames
        tpc = engine.config.audio.tokens_per_chunk
        n_frames = num_mel_frames(len(req.samples))
        bucket = engine._pick_bucket(n_frames)
        wave, n_true = pad_waveform(
            req.samples, bucket_frames=bucket * cf
        )
        full, tail = n_true // cf, n_true % cf
        n_audio = full * tpc + (
            feat_extract_output_length(tail) if tail else 0
        )
        prompt = build_prompt(n_audio, req.language, engine.tokenizer)
        p_bucket = engine._prompt_bucket(bucket)
        ids = np.zeros(p_bucket, np.int32)
        ids[: len(prompt)] = prompt
        return bucket, wave, n_true, ids, len(prompt)

    def _admit(self, slot_idx: int, req: Request) -> None:
        bucket, wave, n_true, ids, prompt_len = self._prepare(req)
        c = self.prefill_chunk_tokens
        if c is not None and prompt_len > c:
            self._start_chunked(
                slot_idx, req, bucket, wave, n_true, ids, prompt_len
            )
        else:
            self._admit_monolithic(
                slot_idx, req, bucket, wave, n_true, ids, prompt_len
            )

    def _next_admit_key(self):
        """Fresh PRNG key for one admission's first-token sample."""
        self._admit_seq += 1
        return jax.random.fold_in(self._base_key, self._admit_seq)

    def _admit_monolithic(self, slot_idx, req, bucket, wave, n_true, ids,
                          prompt_len) -> None:
        engine = self.engine
        fn = self._prefill_graph(bucket)
        tok0, self.cache = fn(
            engine.enc_params,
            engine.dec_params,
            jnp.asarray(wave),
            jnp.int32(n_true),
            jnp.asarray(ids),
            jnp.int32(prompt_len),
            self.cache,
            jnp.int32(slot_idx),
            jnp.float32(req.temperature),
            jnp.float32(req.top_p),
            self._next_admit_key(),
        )
        slot = self.slots[slot_idx]
        slot.request = req
        slot.tokens = []
        slot.max_new = min(
            req.max_new_tokens or self.max_new, self.max_new
        )
        self._set_slot_state(
            slot_idx, tok0, prompt_len, False,
            temperature=req.temperature, top_p=req.top_p,
        )
        logger.debug(
            "admitted request into slot %d (bucket %d chunks, prompt %d)",
            slot_idx, bucket, prompt_len,
        )

    def _admit_batch(self, items) -> None:
        """Admit same-bucket monolithic requests in ONE batched dispatch.

        ``items``: list of (slot_idx, req, prep) with identical buckets.
        The batch pads to the next power of two by replicating row 0
        (slot id included): duplicate rows compute identical slab data,
        so the extra write is a no-op, and padded rows' first tokens are
        simply ignored. Power-of-two padding bounds the compiled graph
        set to log2(admit_batch_max) sizes per bucket.
        """
        engine = self.engine
        bucket = items[0][2][0]
        g = len(items)
        n = 1
        while n < g:
            n *= 2
        rows = items + [items[0]] * (n - g)
        waves = np.stack([r[2][1] for r in rows])
        n_trues = np.asarray([r[2][2] for r in rows], np.int32)
        ids = np.stack([r[2][3] for r in rows])
        true_lens = np.asarray([r[2][4] for r in rows], np.int32)
        slot_ids = np.asarray([r[0] for r in rows], np.int32)
        temps = np.asarray([r[1].temperature for r in rows], np.float32)
        topps = np.asarray([r[1].top_p for r in rows], np.float32)
        fn = self._batched_prefill_graph(bucket, n)
        tok0, self.cache = fn(
            engine.enc_params,
            engine.dec_params,
            jnp.asarray(waves),
            jnp.asarray(n_trues),
            jnp.asarray(ids),
            jnp.asarray(true_lens),
            self.cache,
            jnp.asarray(slot_ids),
            jnp.asarray(temps),
            jnp.asarray(topps),
            self._next_admit_key(),
        )
        for j, (slot_idx, req, prep) in enumerate(items):
            slot = self.slots[slot_idx]
            slot.request = req
            slot.tokens = []
            slot.max_new = min(
                req.max_new_tokens or self.max_new, self.max_new
            )
            self._set_slot_state(
                slot_idx, tok0[j], prep[4], False,
                temperature=req.temperature, top_p=req.top_p,
            )
        logger.debug(
            "batched admission: %d requests (padded to %d) into slots %s "
            "(bucket %d chunks)", g, n, [r[0] for r in items], bucket,
        )

    def _start_chunked(self, slot_idx, req, bucket, wave, n_true, ids,
                       prompt_len) -> None:
        """Begin chunked admission.

        The slot is reserved (not re-admittable) but stays out of decode
        (done flag) until _advance_prefill commits the finished cache.
        Clips spanning several encoder window groups also SEGMENT the
        encoder pass (one group per scheduler step); shorter clips
        encode inline and go straight to chunked prefill.
        """
        engine = self.engine
        slot = self.slots[slot_idx]
        slot.request = req
        slot.tokens = []
        slot.max_new = min(
            req.max_new_tokens or self.max_new, self.max_new
        )
        # masked out of decode until commit
        self._set_slot_state(slot_idx, 0, 0, True)

        cpw = engine.config.audio.chunks_per_window
        gchunks = self._group_chunks(bucket)
        if (
            self.encode_window_groups is not None
            and bucket > gchunks
            and min(cpw, bucket) == cpw  # whole-window groups only
        ):
            mel = self._mel_graph(bucket)(
                jnp.asarray(wave), jnp.int32(n_true)
            )
            n_groups = -(-bucket // gchunks)
            tpc = engine.config.audio.tokens_per_chunk
            buf = jnp.zeros(
                (n_groups * gchunks * tpc, engine.config.audio.output_dim),
                engine.dtype,
            )
            self.encoding[slot_idx] = _EncodeJob(
                mel=mel, embeds=buf, n_true=n_true, ids=ids,
                prompt_len=prompt_len, bucket=bucket, n_groups=n_groups,
            )
            logger.debug(
                "slot %d segmented-encode admission started "
                "(%d groups of %d chunks)", slot_idx, n_groups, gchunks,
            )
            return

        hidden = self._encode_graph(bucket)(
            engine.enc_params,
            engine.dec_params,
            jnp.asarray(wave),
            jnp.int32(n_true),
            jnp.asarray(ids),
        )
        self._begin_prefill(slot_idx, bucket, hidden, prompt_len)
        logger.debug(
            "slot %d chunked admission started (prompt %d, chunk %d)",
            slot_idx, prompt_len, self.prefill_chunk_tokens,
        )

    def _begin_prefill(self, slot_idx, bucket, hidden, prompt_len) -> None:
        tmp = KVCache.zeros(
            self.engine.config.text, 1, hidden.shape[1],
            dtype=self.engine.dtype, quantized=self.kv_quant,
        )
        self.prefilling[slot_idx] = _PrefillJob(
            hidden=hidden, tmp=tmp, prompt_len=prompt_len, bucket=bucket
        )

    def _advance_encode(self, slot_idx: int) -> None:
        """Run ONE encoder window group; hand off to prefill when done."""
        job = self.encoding[slot_idx]
        job.embeds = self._encode_group_graph(job.bucket)(
            self.engine.enc_params, job.mel, jnp.int32(job.n_true),
            jnp.int32(job.cursor), job.embeds,
        )
        job.cursor += 1
        if job.cursor >= job.n_groups:
            hidden = self._inject_graph(job.bucket)(
                self.engine.dec_params, job.embeds,
                jnp.int32(job.n_true), jnp.asarray(job.ids),
            )
            del self.encoding[slot_idx]
            self._begin_prefill(
                slot_idx, job.bucket, hidden, job.prompt_len
            )
            logger.debug(
                "slot %d encode complete; chunked prefill begins", slot_idx
            )

    def _advance_prefill(self, slot_idx: int) -> None:
        """Run ONE bounded prefill chunk; commit to the slab when done."""
        job = self.prefilling[slot_idx]
        req = self.slots[slot_idx].request
        temperature = req.temperature if req is not None else 0.0
        top_p = req.top_p if req is not None else 1.0
        c = self.prefill_chunk_tokens
        true_in = min(c, job.prompt_len - job.cursor)
        tok0, job.tmp = self._chunk_fn()(
            self.engine.dec_params,
            job.hidden,
            jnp.int32(job.cursor),
            job.tmp,
            jnp.int32(true_in),
            jnp.float32(temperature),
            jnp.float32(top_p),
            self._next_admit_key(),
        )
        job.cursor += c
        if job.cursor >= job.prompt_len:
            self.cache = self._commit_fn()(
                job.tmp, self.cache, jnp.int32(slot_idx),
            )
            self._set_slot_state(
                slot_idx, tok0, job.prompt_len, False,
                temperature=temperature, top_p=top_p,
            )
            del self.prefilling[slot_idx]
            logger.debug(
                "slot %d prefill committed (%d prompt tokens)",
                slot_idx, job.prompt_len,
            )

    def _slot_update_fn(self):
        if self._setstate_jit is None:
            def fn(d_tok, d_pos, d_done, d_temp, d_topp, i, t, p, flag,
                   temp, topp):
                return (
                    d_tok.at[i].set(t),
                    d_pos.at[i].set(p),
                    d_done.at[i].set(flag),
                    d_temp.at[i].set(temp),
                    d_topp.at[i].set(topp),
                )

            self._setstate_jit = jax.jit(fn)
        return self._setstate_jit

    def _set_slot_state(self, i, tok0, pos0, done,
                        temperature: float = 0.0,
                        top_p: float = 1.0) -> None:
        """Scatter one slot's decode state into the device arrays.

        ``tok0`` may be a device scalar (no host sync — the host tok
        mirror is not used for scheduling). Bumps the slot version so an
        already-inflight segment cannot clobber this slot at drain.
        """
        (self.d_tok, self.d_pos, self.d_done,
         self.d_temp, self.d_topp) = self._slot_update_fn()(
            self.d_tok, self.d_pos, self.d_done, self.d_temp,
            self.d_topp,
            jnp.int32(i), jnp.asarray(tok0, jnp.int32),
            jnp.int32(pos0), jnp.asarray(done),
            jnp.float32(temperature), jnp.float32(top_p),
        )
        self.tok[i] = 0
        self.pos[i] = pos0
        self.done[i] = bool(done)
        self._slot_version[i] += 1

    def _finish(self, slot_idx: int) -> None:
        slot = self.slots[slot_idx]
        req = slot.request
        try:
            raw = self.engine.tokenizer.decode(slot.tokens)
            lang, text = parse_asr_output(raw, req.language is not None)
            req.result = TranscribeResult(
                text=text, language=lang, raw_output=raw
            )
        except Exception as e:  # noqa: BLE001
            req.error = e
        req.finish_time = time.monotonic()
        req.event.set()
        slot.request = None
        # force the device done flag too: an inflight segment may still
        # be decoding this slot; without this a cap-finished slot would
        # keep stepping until readmission
        self._set_slot_state(slot_idx, 0, int(self.pos[slot_idx]), True)
        logger.debug(
            "slot %d finished with %d tokens", slot_idx, len(slot.tokens)
        )

    def _segment_params(self):
        """Decoder params for the next segment (precision auto-select).

        "auto" picks int8 when at most ``int8_max_occupancy`` slots are
        live (weight-stream-bound regime) and bf16 above it. The host
        ``done`` mirror lags one segment — a heuristic input, never a
        correctness one (both param sets decode identically-shaped
        state; only logits numerics differ).
        """
        mode = self.serving_precision
        if mode == "engine":
            return self.engine.dec_params
        if mode == "auto":
            live = sum(
                1 for i, s in enumerate(self.slots)
                if s.active and not self.done[i]
            )
            mode = "int8" if live <= self.int8_max_occupancy else "bf16"
        return self._params_by_precision[mode]

    def _dispatch_segment(self) -> None:
        """Launch one decode segment from the device state (async)."""
        # the sampling/nucleus graphs only when some live slot asked
        # for them — the host temperature/top_p mirrors are exact (set
        # at admission under the scheduler thread, never device-written)
        live = [
            s.request for s in self.slots
            if s.active and s.request is not None
        ]
        if any(r.temperature > 0 and r.top_p < 1.0 for r in live):
            variant = "nucleus"
        elif any(r.temperature > 0 for r in live):
            variant = "sample"
        else:
            variant = "greedy"
        fn = self._segment_graph(variant)
        tok, pos, done, out, self.cache, self.d_key = fn(
            self._segment_params(),
            self.cache,
            self.d_tok,
            self.d_pos,
            self.d_done,
            self.d_temp,
            self.d_topp,
            self.d_key,
        )
        self.d_tok, self.d_pos, self.d_done = tok, pos, done
        self._inflight = (out, tok, pos, done, self._slot_version.copy())
        for a in (out, tok, pos, done):
            try:
                a.copy_to_host_async()
            except Exception:  # noqa: BLE001 — best-effort prefetch
                pass

    def _drain(self) -> None:
        """Fetch + apply the previously dispatched segment's results.

        Called AFTER the next segment is dispatched, so this host
        round-trip overlaps device compute. A slot whose version changed
        since dispatch (re-admitted or force-finished) is skipped.
        """
        if self._inflight is None:
            return
        out, tok, pos, done, vers = self._inflight
        self._inflight = None
        out = np.asarray(out)
        tok = np.asarray(tok)
        pos = np.asarray(pos)
        done = np.asarray(done)
        for i, slot in enumerate(self.slots):
            if self._slot_version[i] != vers[i]:
                continue
            self.tok[i] = tok[i]
            self.pos[i] = pos[i]
            self.done[i] = done[i]
            if (not slot.active or i in self.prefilling
                    or i in self.encoding):
                continue
            emitted = out[i][out[i] != PAD_TOKEN].tolist()
            room = slot.max_new - len(slot.tokens)
            slot.tokens.extend(emitted[:room])
            if done[i] or len(slot.tokens) >= slot.max_new:
                self._finish(i)

    def step(self, block_timeout: float = 0.05) -> bool:
        """One scheduler iteration. Returns True if any work was done.

        Order matters: admissions first (their device ops precede the
        segment), then the next decode segment is DISPATCHED, and only
        then is the previous segment DRAINED — decode never waits on the
        host round-trip (segment pipelining).
        """
        # admit as many queued requests as there are free slots;
        # same-bucket short-prompt admissions coalesce into batched
        # dispatches (one encoder+prefill round trip for the group)
        admitted = False
        batchable: dict[int, list] = {}
        c = self.prefill_chunk_tokens
        for i, slot in enumerate(self.slots):
            if slot.active:
                continue
            try:
                req = self.queue.get_nowait()
            except queue.Empty:
                break
            try:
                prep = self._prepare(req)
                bucket, prompt_len = prep[0], prep[4]
                if c is not None and prompt_len > c:
                    self._start_chunked(i, req, *prep)
                    admitted = True
                elif self.admit_batch_max > 1:
                    batchable.setdefault(bucket, []).append((i, req, prep))
                else:
                    self._admit_monolithic(i, req, *prep)
                    admitted = True
            except Exception as e:  # noqa: BLE001
                req.error = e
                req.event.set()
        for items in batchable.values():
            while items:
                group = items[: self.admit_batch_max]
                items = items[self.admit_batch_max:]
                try:
                    if len(group) == 1:
                        i, req, prep = group[0]
                        self._admit_monolithic(i, req, *prep)
                    else:
                        self._admit_batch(group)
                    admitted = True
                except Exception as e:  # noqa: BLE001
                    for _, req, _ in group:
                        req.error = e
                        req.event.set()

        if not any(s.active for s in self.slots) and self._inflight is None:
            if not admitted:
                # idle: block briefly for the next request
                try:
                    req = self.queue.get(timeout=block_timeout)
                except queue.Empty:
                    return False
                try:
                    self._admit(0, req)
                except Exception as e:  # noqa: BLE001
                    req.error = e
                    req.event.set()
                    return True
            if not any(s.active for s in self.slots):
                return admitted

        # advance each mid-admission slot by ONE bounded unit of work
        # (an encoder window group, or a prefill chunk) so a long clip
        # never stalls decoding slots for more than one dispatch
        for i in list(self.encoding):
            try:
                self._advance_encode(i)
            except Exception as e:  # noqa: BLE001
                job_req = self.slots[i].request
                job_req.error = e
                job_req.event.set()
                self.slots[i].request = None
                self.encoding.pop(i, None)
                self._set_slot_state(i, 0, 0, True)
        for i in list(self.prefilling):
            try:
                self._advance_prefill(i)
            except Exception as e:  # noqa: BLE001
                job_req = self.slots[i].request
                job_req.error = e
                job_req.event.set()
                self.slots[i].request = None
                del self.prefilling[i]
                self._set_slot_state(i, 0, 0, True)

        decodable = any(
            s.active and i not in self.prefilling and i not in self.encoding
            for i, s in enumerate(self.slots)
        )
        if decodable:
            self._dispatch_segment()
        self._drain()
        return True

    def warmup(self, buckets=None) -> None:
        """Precompile admission + decode-segment graphs before traffic.

        Drives synthetic silent requests through the scheduler: one per
        audio bucket (compiling each bucket's mel/encode/prefill
        graphs), then a full-occupancy burst so the segment graph
        compiles at real batch state — in ``serving_precision="auto"``
        the burst covers BOTH precision variants (low occupancy during
        the tail compiles int8, high occupancy bf16). A cold compile
        inside live traffic would stall every active request (measured:
        a mid-burst segment compile cost 2.6x aggregate throughput in
        scripts/bench_serving.py before the bench warmed both).
        """
        cf = self.engine.config.audio.chunk_frames
        if buckets is None:
            buckets = [
                c for c in self.engine.chunk_buckets
                if c <= self.max_chunks
            ]
        # One decode segment per synthetic request is enough to compile
        # every graph; the default max_new (512) would burn ~60 wasted
        # segments per bucket on silence.
        max_new = max(1, self.segment_steps)
        for c in buckets:
            clip = np.zeros(int(c * cf * 160), np.float32)
            r = Request(samples=clip, max_new_tokens=max_new)
            self.submit(r)
            while not r.event.is_set():
                self.step(block_timeout=0.001)
            logger.info("serving warmup: bucket %d chunks compiled", c)
        small = np.zeros(int(min(buckets) * cf * 160), np.float32)
        # batched-admission graphs key on (BUCKET, padded size): compile
        # every pair, not just the smallest bucket's — a mixed-length
        # burst admits batches at EVERY bucket, and a cold batched
        # encoder+prefill compile mid-burst stalls the whole pool
        # (measured: the smallest-bucket-only warmup left a 16-slot
        # mixed 4/8/30 s burst at 6.8x aggregate vs 137x warmed —
        # every request waited behind live compiles).
        for c in buckets:
            clip = np.zeros(int(c * cf * 160), np.float32)
            g = 2
            while g <= min(self.admit_batch_max, self.n_slots):
                burst = [
                    Request(samples=clip, max_new_tokens=max_new)
                    for _ in range(g)
                ]
                for r in burst:
                    self.submit(r)
                while not all(r.event.is_set() for r in burst):
                    self.step(block_timeout=0.001)
                logger.info(
                    "serving warmup: batched admission size %d compiled "
                    "(bucket %d chunks)", g, c,
                )
                g *= 2
        # one sampled request in the burst compiles the SAMPLING segment
        # variant too, so the first live temperature>0 request doesn't
        # stall the pool on a cold compile
        burst = [
            Request(
                samples=small, max_new_tokens=max_new,
                temperature=0.7 if i == 0 else 0.0,
            )
            for i in range(self.n_slots)
        ]
        for r in burst:
            self.submit(r)
        while not all(r.event.is_set() for r in burst):
            self.step(block_timeout=0.001)
        # a SOLO sampled request after the burst: at occupancy 1 the
        # "auto" precision picks the other param set than the burst's
        # high-occupancy segments did, so the sampling segment graph
        # compiles for BOTH precision variants (the burst's sampled
        # member only covered the high-occupancy one)
        solo = Request(
            samples=small, max_new_tokens=max_new, temperature=0.7
        )
        self.submit(solo)
        while not solo.event.is_set():
            self.step(block_timeout=0.001)
        # same dance for the NUCLEUS segment variant (per-request
        # top_p < 1): one nucleus member in a full burst (high-occupancy
        # precision) + one solo (low-occupancy precision)
        burst = [
            Request(
                samples=small, max_new_tokens=max_new,
                temperature=0.7 if i == 0 else 0.0,
                top_p=0.9 if i == 0 else 1.0,
            )
            for i in range(self.n_slots)
        ]
        for r in burst:
            self.submit(r)
        while not all(r.event.is_set() for r in burst):
            self.step(block_timeout=0.001)
        solo = Request(
            samples=small, max_new_tokens=max_new, temperature=0.7,
            top_p=0.9,
        )
        self.submit(solo)
        while not solo.event.is_set():
            self.step(block_timeout=0.001)
        logger.info(
            "serving warmup: %d-slot burst compiled (all precision "
            "variants, greedy + sampling + nucleus segment graphs)",
            self.n_slots,
        )


class ServingLoop(threading.Thread):
    """Background thread driving a ContinuousBatcher."""

    def __init__(self, batcher: ContinuousBatcher):
        super().__init__(daemon=True)
        self.batcher = batcher
        # NOT named _stop: Thread's internals call a private _stop()
        # method during join(), which an Event attribute would shadow.
        self._stop_event = threading.Event()

    def stop(self):
        self._stop_event.set()

    def run(self):
        while not self._stop_event.is_set():
            try:
                self.batcher.step()
            except Exception:  # noqa: BLE001
                logger.exception("serving loop iteration failed")
                # fail any in-flight requests rather than hanging clients
                for i, slot in enumerate(self.batcher.slots):
                    if slot.active:
                        slot.request.error = RuntimeError(
                            "serving loop failure"
                        )
                        slot.request.event.set()
                        slot.request = None
                        self.batcher.done[i] = True
                self.batcher.prefilling.clear()
                self.batcher.encoding.clear()
                self.batcher._inflight = None
