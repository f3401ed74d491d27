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

import os
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
from ..utils.tracing import stage_timer
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
    # time-stamped spans of ``text`` (runtime/longform.Segment); filled
    # by the file-level transcribe() API, None on raw sample paths
    segments: Optional[list] = None


@dataclasses.dataclass
class DraftBundle:
    """A second, smaller model used as the speculative-decoding draft.

    It shares the target's mel features and prompt token ids but runs
    its OWN audio encoder, embedding table, and KV slab inside the fused
    graph (its hidden width differs from the target's).
    """

    config: AsrConfig
    encoder: AudioEncoder
    decoder: TextDecoder           # prefill (layer scan)
    decoder_unrolled: TextDecoder  # decode steps
    enc_params: object
    dec_params: object


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
        quantize: Optional[str] = None,
        kv_dtype: Optional[str] = None,
        unroll_decode: bool = False,
        mesh=None,
        speculative: Optional[str] = None,
        spec_k: int = 4,
        draft_model=None,
    ):
        """``speculative``: enable draft-and-verify speculative decoding
        for single-stream greedy transcription. The value names the
        DRAFT precision ('int4' | 'int4g' | 'int8' | 'lm8' | 'bf16'),
        built by quantizing a second copy of this checkpoint's decoder
        weights; the loaded model (at ``quantize``'s precision, default
        bf16) verifies all ``spec_k`` draft tokens in ONE chunk-scored
        call per iteration, so the output is BIT-IDENTICAL to plain
        greedy decoding — only the speed depends on how often the draft
        agrees. 'bf16' drafts with the target weights themselves
        (acceptance 1.0; a machinery-overhead measurement mode). See
        _transcribe_graph's spec path and models/text_decoder.score_chunk.

        ``draft_model``: CROSS-MODEL speculative decoding — draft with a
        genuinely smaller checkpoint (e.g. 0.6B drafting for a 1.7B
        target: the draft streams ~1/3 the weight bytes per token and
        the verify call amortizes one target read over up to spec_k+1
        tokens). Accepts a model directory, or a
        ``(AsrConfig, (enc_params, dec_params))`` tuple for tests. The
        draft runs its OWN audio encoder and KV slab inside the fused
        graph (its hidden width differs from the target's); the prompt
        tokens, mel features, and greedy-verify semantics are shared, so
        output remains bit-identical to the target's plain greedy
        decode. When ``draft_model`` is given, ``speculative`` names the
        DRAFT's quantization (None/'bf16' = keep the draft bf16;
        'int8'/'int4'/'int4g'/'lm8' quantize the draft's decoder —
        e.g. a 0.6B-int4 draft under a 1.7B-bf16 target).
        """
        from ..utils.compile_cache import enable_persistent_compile_cache

        enable_persistent_compile_cache()
        model_dir = Path(model_dir) if model_dir is not None else None
        if config is None:
            config = AsrConfig.from_file(model_dir / "config.json")
        self.config = config
        self.dtype = dtype
        self.max_new_tokens = max_new_tokens
        self.chunk_buckets = tuple(sorted(chunk_buckets))

        # Cross-model draft: `speculative` re-targets to the DRAFT's
        # quantization; the engine's own decode params stay plain.
        self._draft_model = draft_model
        self._draft_quant = None
        if draft_model is not None:
            if mesh is not None:
                raise ValueError(
                    "speculative decoding runs the single-stream greedy "
                    "path; it is not supported under a device mesh"
                )
            if int(spec_k) < 1:
                raise ValueError(f"spec_k must be >= 1, got {spec_k}")
            self._draft_quant = speculative or "bf16"
            speculative = None

        stay_host = (
            mesh is not None
            or quantize in ("int8", "int4", "int4g")
            or speculative not in (None, "bf16")
        )
        if params is None:
            logger.info("Loading weights from %s", model_dir)
            t0 = time.monotonic()
            # Under a mesh OR a quantize mode the params stay on host
            # here: shard_params/device_put below does the placement,
            # and quantization in between runs on the host CPU so (a)
            # the transfer ships the quantized bytes instead of bf16 and
            # (b) the chip never holds base + merged copies + f32 temps
            # at once (~13 GB peak at 1.7B — OOMed on a 16 GB chip,
            # round 4).
            params = load_model_params(
                model_dir, config, dtype,
                device=None if stay_host else "default",
            )
            logger.info("Weights loaded in %.1fs", time.monotonic() - t0)
        else:
            stay_host = mesh is not None  # caller-placed params: leave
        self.enc_params, self.dec_params = params

        # A dp-only mesh replicates the weights and shard_maps the fused
        # graph over the batch (see _graph): every single-device feature
        # — Pallas kernels, int4/lm8 quant, int8 KV — works per shard.
        # Only tensor parallelism (tp > 1) restricts the feature set.
        mesh_tp = mesh.shape.get("tp", 1) if mesh is not None else 1
        # Host-loaded params quantize on the host CPU (uncommitted
        # arrays follow default_device); caller-placed device params
        # are committed and quantize where they live, as before.
        import contextlib

        if stay_host:
            try:
                _qdev = jax.default_device(jax.devices("cpu")[0])
            except RuntimeError:  # no CPU backend: quantize on default
                _qdev = contextlib.nullcontext()
        else:
            _qdev = contextlib.nullcontext()
        # Speculative decoding: build the DRAFT weights from the base
        # (pre-quantization) checkpoint before _quantize_params rebinds
        # self.dec_params. The draft shares the embed table (quantization
        # never touches it), so its HBM cost is just the quantized
        # layers + lm_head (~0.3 GB at 0.6B int4).
        self.spec_k = int(spec_k)
        self.draft_params = None
        if speculative is not None:
            if mesh is not None:
                raise ValueError(
                    "speculative decoding runs the single-stream greedy "
                    "path; it is not supported under a device mesh"
                )
            if self.spec_k < 1:
                raise ValueError(f"spec_k must be >= 1, got {spec_k}")
            base_dec = self.dec_params

        with _qdev:
            self._quantize_params(quantize, mesh_tp)
            if speculative is not None:
                self.draft_params = self._build_draft_params(
                    base_dec, speculative
                )

        if stay_host and mesh is None:
            # placement deferred past quantization: ship the quantized
            # bytes (0.9-1.6 GB at 1.7B int4/int8 vs 3.1 GB bf16) and
            # keep the chip clear of the quantization temps. The device
            # must be EXPLICIT: device_put(x) without one leaves
            # cpu-backend arrays on the cpu (sharding preserved), and
            # the whole decode would then stream weights from host
            # (measured: 0.45x RT at 1.7B — 100x slowdown).
            dev = jax.devices()[0]
            self.enc_params = jax.device_put(self.enc_params, dev)
            self.dec_params = jax.device_put(self.dec_params, dev)
            if self.draft_params is not None:
                # shared leaves (embed, possibly lm_head) were already
                # moved above; device_put is a no-op for those
                self.draft_params = jax.device_put(self.draft_params, dev)

        # int8 KV slab (opt-in): HALF the per-step slab HBM stream and
        # double the slot capacity; per-(layer,example,head,slot)
        # symmetric scales, dequantized at the attention site. The
        # single-utterance/batch graphs use it; serving and streaming
        # manage their own caches (serving: kv_dtype).
        if kv_dtype is None:
            kv_dtype = os.environ.get("ASR_KV")
        if kv_dtype in (None, "bf16"):
            self.kv_quant = False
        elif kv_dtype == "int8":
            if mesh_tp > 1:
                raise ValueError(
                    "kv_dtype='int8' is not supported under tensor "
                    "parallelism (works on dp-only meshes)"
                )
            self.kv_quant = True
        else:
            raise ValueError(f"unknown kv_dtype {kv_dtype!r}")

        # Multi-chip: shard the parameters over a (dp, tp) mesh; GSPMD
        # propagates the shardings through the fused graph and inserts
        # the collectives (Megatron TP for the decoder, TP-when-heads-
        # divide for the encoder). The reference has no multi-device
        # path at all (SURVEY.md §2.3).
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.sharding import (
                decoder_param_specs,
                encoder_param_specs,
                int4_decoder_param_specs,
                quantized_decoder_param_specs,
                shard_params,
            )

            tp = mesh.shape.get("tp", 1)
            self.enc_params = shard_params(
                self.enc_params, mesh,
                encoder_param_specs(
                    config.audio.encoder_attention_heads, tp
                ),
            )
            if quantize == "int8":
                dec_specs = quantized_decoder_param_specs()
            elif quantize == "int4" and tp > 1:
                dec_specs = int4_decoder_param_specs()
            else:
                # dp-only meshes replicate whatever layout is in use
                # (incl. merged/int4/lm8 pytrees): unlisted keys
                # default to replicated in shard_params
                dec_specs = decoder_param_specs()
            self.dec_params = shard_params(self.dec_params, mesh, dec_specs)
            logger.info("Parameters sharded over mesh %s", dict(mesh.shape))

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
        # Prefill always runs the layer scan (compute-bound, compile-
        # light). Decode steps can optionally unroll the layers — slightly
        # better weight streaming (~2% e2e on v5e) at ~5x the compile
        # time, so it is opt-in for long-running servers.
        self.decoder = TextDecoder(config.text, max_position=max_pos)
        if unroll_decode:
            self.decoder_unrolled = TextDecoder(
                config.text, max_position=max_pos, unroll_layers=True
            )
            self.decoder_unrolled.rotary = self.decoder.rotary
        else:
            self.decoder_unrolled = self.decoder
        if mesh_tp > 1:
            # Pallas kernels are single-device programs; tp-sharded
            # graphs take the XLA paths so GSPMD can partition them.
            # dp-only meshes keep the kernels: the fused graph runs
            # under shard_map, one self-contained program per shard.
            self.decoder.prefer_xla = True
            self.decoder_unrolled.prefer_xla = True
        self.draft_bundle = None
        if draft_model is not None:
            self.draft_bundle = self._build_draft_bundle(
                draft_model, self._draft_quant, max_pos, unroll_decode
            )
        self._graphs = {}
        # filled after each speculative dispatch: iterations, tokens,
        # mean accepted drafts per iteration (bench/diagnostics)
        self.last_spec_stats = None

    def _build_draft_bundle(self, draft_model, draft_quant, max_pos,
                            unroll_decode):
        """Load + validate the cross-model draft (see __init__ docs).

        ``draft_model``: model directory, or a
        ``(AsrConfig, (enc_params, dec_params))`` tuple (tests).
        """
        import contextlib

        try:
            _qdev = jax.default_device(jax.devices("cpu")[0])
        except RuntimeError:  # no CPU backend
            _qdev = contextlib.nullcontext()
        if isinstance(draft_model, tuple):
            dcfg, (denc, ddec) = draft_model
        else:
            ddir = Path(draft_model)
            dcfg = AsrConfig.from_file(ddir / "config.json")
            logger.info("Loading draft weights from %s", ddir)
            denc, ddec = load_model_params(
                ddir, dcfg, self.dtype, device=None
            )
        # The draft must tokenize, chunk, and count audio tokens exactly
        # like the target: the verify compares token IDS, and the prompt
        # (with its n_audio AUDIO_PAD run) is built once for both.
        cfg = self.config
        if dcfg.text.vocab_size != cfg.text.vocab_size:
            raise ValueError(
                f"draft vocab_size {dcfg.text.vocab_size} != target "
                f"{cfg.text.vocab_size}: speculative tokens would not "
                "be comparable"
            )
        for field in ("num_mel_bins", "chunk_frames", "tokens_per_chunk",
                      "n_window_infer"):
            dv, tv = getattr(dcfg.audio, field), getattr(cfg.audio, field)
            if dv != tv:
                raise ValueError(
                    f"draft audio {field}={dv} != target {tv}: the "
                    "models would disagree on the audio-token layout"
                )
        if draft_quant not in (None, "bf16"):
            with _qdev:  # quantize on host: no f32 temps on the chip
                ddec = self._build_draft_params(ddec, draft_quant)
        # params were staged (and possibly quantized) on the host CPU;
        # ship the final bytes explicitly — like __init__ does for the
        # target's host-staged params, because device_put without a
        # device leaves cpu-committed arrays on the cpu. Harmless no-op
        # on CPU-only runs (tests).
        dev = jax.devices()[0]
        denc = jax.device_put(denc, dev)
        ddec = jax.device_put(ddec, dev)
        decoder = TextDecoder(dcfg.text, max_position=max_pos)
        if unroll_decode:
            unrolled = TextDecoder(
                dcfg.text, max_position=max_pos, unroll_layers=True
            )
            unrolled.rotary = decoder.rotary
        else:
            unrolled = decoder
        return DraftBundle(
            config=dcfg,
            encoder=AudioEncoder(dcfg.audio),
            decoder=decoder,
            decoder_unrolled=unrolled,
            enc_params=denc,
            dec_params=ddec,
        )

    def _build_draft_params(self, base_dec, speculative):
        """Draft weights for speculative decoding (see __init__ docs)."""
        if speculative == "bf16":
            return base_dec  # self-draft: overhead-measurement mode
        from ..weights.quantize import (
            quantize_decoder_params,
            quantize_lm_head_only,
        )

        if speculative == "int4g":
            gsize = int(os.environ.get("ASR_INT4_GROUP", "128"))
            return quantize_decoder_params(
                base_dec, bits=4, merge=True, group_size=gsize
            )
        if speculative in ("int8", "int4"):
            return quantize_decoder_params(
                base_dec, bits=4 if speculative == "int4" else 8,
                merge=True,
            )
        if speculative == "lm8":
            return quantize_lm_head_only(base_dec)
        raise ValueError(
            f"unknown speculative draft mode {speculative!r} "
            "(expected int4 | int4g | int8 | lm8 | bf16)"
        )

    def _quantize_params(self, quantize, mesh_tp):
        """Apply the requested weight-quantization mode in place."""
        if quantize == "int4g":
            # group-wise int4 (the int4 quality hedge): every
            # ASR_INT4_GROUP (default 128) contraction rows get their own
            # scale, so one outlier row no longer crushes the whole
            # channel's resolution. Decode runs the scan path with
            # batched per-group dots (scales vary along K — the
            # megakernel's post-dot per-column apply does not commute);
            # the lm_head defaults to int8.
            from ..weights.quantize import quantize_decoder_params

            if mesh_tp > 1:
                raise ValueError(
                    "quantize='int4g' is not supported under tensor "
                    "parallelism (works on dp-only meshes); use int8"
                )
            gsize = int(os.environ.get("ASR_INT4_GROUP", "128"))
            logger.info(
                "Quantizing decoder weights to int4 (group size %d)", gsize
            )
            merge = os.environ.get("ASR_MERGE_QKV", "1") != "0"
            self.dec_params = quantize_decoder_params(
                self.dec_params, bits=4, merge=merge, group_size=gsize
            )
        elif quantize in ("int8", "int4"):
            from ..weights.quantize import quantize_decoder_params

            logger.info("Quantizing decoder weights to %s", quantize)
            # merged qkv/gateup only without tp: the Megatron TP param
            # specs shard the per-projection names. int4 under tp packs
            # nibbles per shard BLOCK (tp_blocks) so the dequant shards
            # cleanly; note the tp int4 path dequantizes through XLA
            # (weights rest int4 in HBM but materialize per step), so
            # int8 remains the recommended tp precision for speed.
            # ASR_MERGE_QKV=0 keeps per-projection int8 weights: the
            # megakernel's layer-split mode (ffn_tiles > 1, big models)
            # requires unmerged params, so this is the knob for int8
            # layer-split experiments at 1.7B-class sizes.
            merge = mesh_tp == 1 and os.environ.get(
                "ASR_MERGE_QKV", "1"
            ) != "0"
            self.dec_params = quantize_decoder_params(
                self.dec_params,
                bits=4 if quantize == "int4" else 8,
                merge=merge,
                tp_blocks=mesh_tp if quantize == "int4" else 1,
            )
        elif quantize == "lm8":
            # bf16 layers + int8 lm_head: the mildest quality knob —
            # hidden states stay full precision, only the final matvec's
            # stream halves (~12% faster bf16 decode at 0.6B)
            from ..weights.quantize import quantize_lm_head_only

            if mesh_tp > 1:
                raise ValueError(
                    "quantize='lm8' is not supported under tensor "
                    "parallelism (works on dp-only meshes)"
                )
            logger.info("Quantizing lm_head to int8 (layers stay bf16)")
            self.dec_params = quantize_lm_head_only(self.dec_params)
        elif quantize is not None:
            raise ValueError(f"unknown quantize mode {quantize!r}")

        # lm-head folding operands (opt-in via ASR_FOLD_LM=1): prepare
        # the transposed/padded lm_head ONCE so the folded decode step
        # never copies it per token (decode_layer.prepare_lm_fold).
        # int4 lm_head excluded — folding reads int8/bf16 tiles.
        if (
            os.environ.get("ASR_FOLD_LM") == "1"
            and "lm_head_q4" not in self.dec_params
            and mesh_tp == 1  # tp>1 never runs the fold (prefer_xla)
        ):
            from ..ops.pallas.decode_layer import prepare_lm_fold

            lm = self.dec_params.get(
                "lm_head", self.dec_params.get("lm_head_q")
            )
            if lm is not None:
                w, s = prepare_lm_fold(
                    lm, self.dec_params.get("lm_head_s")
                )
                self.dec_params["lm_fold_w"] = w
                self.dec_params["lm_fold_s"] = s


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
    # the fused per-bucket graph (batched; single utterance is B == 1)

    def _dp_size(self) -> int:
        """dp shard count for batch-dim shard_map (1 = unsharded)."""
        if self.mesh is None:
            return 1
        if self.mesh.shape.get("tp", 1) > 1:
            return 1  # tp graphs go through GSPMD whole
        return self.mesh.shape.get("dp", 1)

    def _graph(self, num_chunks: int, batch: int, sample_cfg=None):
        """``sample_cfg``: None for greedy, else static (top_k, top_p) —
        sampling graphs take two extra traced args (rng_key,
        temperature) and are cached separately."""
        key = (num_chunks, batch, sample_cfg)
        if key not in self._graphs:
            sample = sample_cfg is not None
            top_k, top_p = sample_cfg if sample else (0, 1.0)
            dp = self._dp_size()
            if dp > 1 and batch % dp == 0:
                # dp-only mesh: run the fused graph under shard_map —
                # each device gets batch/dp utterances and runs the FULL
                # single-device program (Pallas megakernel, any quant
                # mode, int8 KV). Weights are replicated; there are no
                # collectives, so throughput scales linearly over ICI.
                from jax.sharding import PartitionSpec as P

                fn = functools.partial(
                    self._transcribe_graph, num_chunks,
                    force_aligned=batch > 1,
                    sample=sample, top_k=top_k, top_p=top_p,
                    # replicated key: each shard folds in its dp index
                    # so rows don't share Gumbel noise across shards
                    dp_axis="dp" if sample else None,
                )
                data = P("dp")
                in_specs = (P(), P(), data, data, data, data, data)
                if sample:
                    in_specs = in_specs + (P(), P())
                self._graphs[key] = jax.jit(
                    jax.shard_map(
                        fn,
                        mesh=self.mesh,
                        in_specs=in_specs,
                        out_specs=(data, data),
                        check_vma=False,
                    )
                )
            else:
                self._graphs[key] = jax.jit(
                    functools.partial(
                        self._transcribe_graph, num_chunks,
                        sample=sample, top_k=top_k, top_p=top_p,
                        spec=self._spec_active(batch, sample),
                    )
                )
        return self._graphs[key]

    def _spec_active(self, batch: int, sample: bool) -> bool:
        """Speculative decode applies to single-stream graphs.

        Batched decode amortizes the weight stream across examples (the
        thing spec decoding exists to beat) and per-example acceptance
        counts would desynchronize the shared-slot layout, so batch > 1
        keeps the plain loops. Greedy uses draft-and-verify with exact
        prefix matching (bit-identical output); sampling uses
        speculative SAMPLING (accept d_i with min(1, p/q), residual
        resample — sampling.speculative_accept), which preserves the
        target distribution exactly.
        """
        return (
            (self.draft_params is not None or self.draft_bundle is not None)
            and batch == 1
            and self.mesh is None
        )

    def _transcribe_graph(
        self,
        num_chunks: int,  # static (bound via partial)
        enc_params,
        dec_params,
        wave,            # (B, num_chunks*chunk_frames*160 + 400) f32
        n_true_frames,   # (B,) int32
        token_ids,       # (B, P) int32, zero-padded past true_len
        true_len,        # (B,) int32
        live,            # (B,) bool — False rows are batch padding: they
        #                 are born done, so they generate ZERO tokens and
        #                 never extend the decode while_loop
        rng_key=None,    # (2,) uint32 PRNG key (sampling graphs only)
        temperature=None,  # traced f32 scalar (sampling graphs only)
        draft_params=None,  # draft decoder pytree (spec graphs only)
        force_aligned: bool = False,  # static: right-aligned ids even
        #                 at (local) B == 1 — shard_map shards a global
        #                 aligned batch into possibly-single-row locals
        sample: bool = False,  # static: stochastic decode (sampling.py)
        top_k: int = 0,        # static sampling filters — distinct
        top_p: float = 1.0,    # values compile distinct graphs
        dp_axis: Optional[str] = None,  # static: under shard_map, fold
        #                 the shard index into the key (replicated keys
        #                 would correlate rows across shards)
        spec: bool = False,  # static: speculative draft-and-verify decode
        #                 (B == 1 greedy only; see _spec_active)
    ):
        cfg = self.config
        b = wave.shape[0]
        if sample:
            from .sampling import sample_token

            base_key = rng_key
            if dp_axis is not None:
                base_key = jax.random.fold_in(
                    base_key, jax.lax.axis_index(dp_axis)
                )

        mel = jax.vmap(
            lambda w, n: log_mel_from_padded(
                w, n, self.frontend.mel_filters
            )
        )(wave, n_true_frames)  # (B, mels, F)
        audio_embeds, n_audio = jax.vmap(
            self.encoder, in_axes=(None, 0, 0)
        )(enc_params, mel, n_true_frames)  # (B, C*tpc, H), (B,)

        # --- prompt embedding with audio injection (src/inference.rs:110-124
        # does this with a host loop of slice_scatters; here it's one select)
        p = token_ids.shape[1]
        tok_embeds = self.decoder.embed(dec_params, token_ids)  # (B, P, H)
        hidden_dim = tok_embeds.shape[-1]
        aligned = b > 1 or force_aligned  # right-aligned: prefill_aligned
        slots = jnp.arange(p)

        if aligned:
            # token_ids arrive right-aligned: example b spans
            # [kv_start[b], P). Audio tokens sit at kv_start + 9 + i.
            kv_start = (p - true_len).astype(jnp.int32)
            rel = slots[None, :] - (kv_start[:, None] + AUDIO_OFFSET)
            is_audio = (rel >= 0) & (rel < n_audio[:, None])
            idx = jnp.clip(rel, 0, audio_embeds.shape[1] - 1)
            gathered = jnp.take_along_axis(
                audio_embeds.astype(tok_embeds.dtype), idx[..., None], axis=1
            )
            hidden = jnp.where(is_audio[..., None], gathered, tok_embeds)
        else:
            # left-aligned single utterance: audio at the static offset 9
            shifted = jnp.zeros((b, p, hidden_dim), tok_embeds.dtype)
            n_copy = min(audio_embeds.shape[1], p - AUDIO_OFFSET)
            shifted = jax.lax.dynamic_update_slice(
                shifted,
                audio_embeds[:, :n_copy].astype(tok_embeds.dtype),
                (0, AUDIO_OFFSET, 0),
            )
            is_audio = (slots[None, :] >= AUDIO_OFFSET) & (
                slots[None, :] < AUDIO_OFFSET + n_audio[:, None]
            )
            hidden = jnp.where(is_audio[..., None], shifted, tok_embeds)

        # --- prefill + greedy decode, fully on device, per-example EOS.
        #
        # SEGMENTED SLAB: the KV slab is sized for the generation cap,
        # but slab traffic (and the megakernel's slab mode) scales with
        # the slab size, not the live length — at the reference's
        # 4096-token cap a typical <256-token transcript would pay the
        # big-slab path every step. So decode runs in segments: start
        # with a small slab (pipeline-resident megakernel mode), and only
        # if generation is still going, copy the slab into the next size
        # and continue. Each stage's while_loop runs zero iterations once
        # every example is done, so finished utterances never touch the
        # big slabs. The loop carries the NEXT TOKEN (not logits) so
        # decode_step_token can fold lm_head+argmax into the megakernel.
        max_new = self.max_new_tokens
        seg_caps = []
        seg = max(
            1, min(int(os.environ.get("ASR_DECODE_SEGMENT", "256")), max_new)
        )
        while True:
            seg_caps.append(min(seg, max_new))
            if seg >= max_new:
                break
            seg *= 4

        # spec graphs can emit up to spec_k + 1 tokens per iteration, so
        # the token buffer carries that much slack past the cap (the
        # final window write must stay in bounds; n_gen is clamped to
        # max_new, so only scratch lands in the slack)
        k_spec = self.spec_k if spec else 0
        out_buf = jnp.zeros((b, max_new + (k_spec + 1 if spec else 0)),
                            jnp.int32)
        barange = jnp.arange(b)

        def make_body():
            def body(state):
                cache, tok, n_gen, done, out_buf, step = state
                is_eos = jnp.logical_or(
                    tok == ENDOFTEXT_TOKEN_ID, tok == IM_END_TOKEN_ID
                )
                newly_done = jnp.logical_or(done, is_eos)
                # unconditional: slot n_gen of a done example is never
                # read (hosts slice out_buf[i, :n_gen[i]]), so no
                # keep-gather is needed
                out_buf = out_buf.at[barange, n_gen].set(tok)
                n_gen = jnp.where(newly_done, n_gen, n_gen + 1)
                dec = self.decoder_unrolled
                if sample:
                    # logits-variant steps + on-device sampling; one
                    # fresh key per step (fold_in of the global step
                    # counter, which runs across slab segments)
                    if aligned:
                        logits, cache = dec.decode_step_aligned(
                            dec_params, tok, jnp.int32(p) + step,
                            kv_start, cache
                        )
                    else:
                        logits, cache = dec.decode_step(
                            dec_params, tok, true_len[0] + step, cache
                        )
                    tok = sample_token(
                        logits, jax.random.fold_in(base_key, step + 1),
                        temperature, top_k, top_p,
                    )
                elif aligned:
                    # all examples write the SAME slot: P + step
                    tok, cache = dec.decode_step_aligned_token(
                        dec_params, tok, jnp.int32(p) + step, kv_start,
                        cache
                    )
                else:
                    tok, cache = dec.decode_step_token(
                        dec_params, tok, true_len[0] + step, cache
                    )
                return cache, tok, n_gen, newly_done, out_buf, step + 1
            return body

        # slab lengths round up to the kernels' DMA alignment unit
        # (Mosaic slice-alignment proof): 8 for the k/v sublane slices,
        # 128 for the int8-KV scale slabs' lane slices. Spec decode
        # writes up to k+1 slots past the emitted count, so its slabs
        # carry that much slack.
        _align = 128 if self.kv_quant else 8

        def slab_len(cap):
            return -(-(p + cap + 1 + (k_spec + 1 if spec else 0))
                     // _align) * _align

        def grow_cache(cache, new_len, cfg_text=cfg.text):
            """Copy a slab cache into a larger zero slab."""
            bigger = KVCache.zeros(
                cfg_text, b, new_len, dtype=self.dtype,
                quantized=self.kv_quant,
            )
            return KVCache(
                k=jax.lax.dynamic_update_slice(
                    bigger.k, cache.k, (0, 0, 0, 0, 0)
                ),
                v=jax.lax.dynamic_update_slice(
                    bigger.v, cache.v, (0, 0, 0, 0, 0)
                ),
                k_scale=(
                    None if not self.kv_quant
                    else jax.lax.dynamic_update_slice(
                        bigger.k_scale, cache.k_scale, (0, 0, 0, 0)
                    )
                ),
                v_scale=(
                    None if not self.kv_quant
                    else jax.lax.dynamic_update_slice(
                        bigger.v_scale, cache.v_scale, (0, 0, 0, 0)
                    )
                ),
            )

        cache = KVCache.zeros(
            cfg.text, b, slab_len(seg_caps[0]), dtype=self.dtype,
            quantized=self.kv_quant,
        )
        if aligned:
            logits, cache = self.decoder.prefill_aligned(
                dec_params, hidden, kv_start, cache
            )
        else:
            logits, cache = self.decoder.prefill(
                dec_params, hidden, slots, cache, true_len[0]
            )
        if sample:
            tok0 = sample_token(
                logits, jax.random.fold_in(base_key, 0),
                temperature, top_k, top_p,
            )
        else:
            tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)

        if spec:
            if self.draft_bundle is not None:
                # cross-model draft: its own encoder, embed table, and
                # hidden width — only mel, prompt ids, and the greedy
                # verify are shared with the target
                bundle = self.draft_bundle
                d_enc_params, d_dec_params = draft_params
                d_audio, _ = jax.vmap(
                    bundle.encoder, in_axes=(None, 0, 0)
                )(d_enc_params, mel, n_true_frames)
                d_tok = bundle.decoder.embed(d_dec_params, token_ids)
                d_shift = jnp.zeros(
                    (b, p, d_tok.shape[-1]), d_tok.dtype
                )
                d_copy = min(d_audio.shape[1], p - AUDIO_OFFSET)
                d_shift = jax.lax.dynamic_update_slice(
                    d_shift, d_audio[:, :d_copy].astype(d_tok.dtype),
                    (0, AUDIO_OFFSET, 0),
                )
                d_hidden = jnp.where(is_audio[..., None], d_shift, d_tok)
                draft = (bundle.decoder, bundle.decoder_unrolled,
                         d_dec_params, bundle.config.text, d_hidden)
            else:
                draft = (self.decoder, self.decoder_unrolled,
                         draft_params, cfg.text, hidden)
            if sample:
                return self._spec_sample_loop(
                    dec_params, draft, slots, cache, tok0,
                    true_len, live, out_buf, seg_caps, slab_len,
                    grow_cache, max_new,
                    base_key, temperature, top_k, top_p,
                )
            return self._spec_decode_loop(
                dec_params, draft, slots, cache, tok0,
                true_len, live, out_buf, seg_caps, slab_len, grow_cache,
                max_new,
            )

        state = (
            cache, tok0, jnp.zeros((b,), jnp.int32),
            jnp.logical_not(live), out_buf, jnp.int32(0),
        )
        for cap in seg_caps:
            if state[0].max_len < slab_len(cap):  # grow into the next slab
                state = (grow_cache(state[0], slab_len(cap)),) + state[1:]

            def cond(state, cap=cap):
                _, _, _, done, _, step = state
                return jnp.logical_and(jnp.any(~done), step < cap)

            state = jax.lax.while_loop(cond, make_body(), state)

        _, _, n_gen, _, out_buf, _ = state
        return out_buf, n_gen

    def _spec_decode_loop(
        self,
        dec_params,
        draft,      # (prefill_decoder, step_decoder, params, text_cfg,
        #             hidden): the same-checkpoint quantized draft, or a
        #             cross-model DraftBundle's pieces with ITS injected
        #             prompt embeddings (different hidden width)
        slots,      # (P,) position ids
        cache,      # target KV cache, prompt already prefilled
        tok0,       # (1,) first generated token (target prefill argmax)
        true_len,   # (1,) int32
        live,       # (1,) bool
        out_buf,    # (1, max_new + k + 1) int32
        seg_caps,
        slab_len,
        grow_cache,
        max_new: int,
    ):
        """Draft-and-verify greedy decode (single stream, on device).

        Each iteration: (1) the DRAFT weights (a quantized copy of this
        checkpoint, engine `speculative=`) greedily decode k+1 tokens
        with ordinary fused steps against their own KV slab — the +1
        keeps the draft slab's slot pos+k valid when all k drafts are
        accepted; (2) the TARGET weights score the block
        [last_token, d_1..d_k] in ONE chunked call (score_chunk), whose
        per-position argmaxes t_1..t_{k+1} are the model's true greedy
        continuations; (3) the longest prefix with d_i == t_i is
        accepted and t_1..t_{a+1} are emitted — every emitted token is a
        target argmax given the previously emitted prefix, so the output
        is BIT-IDENTICAL to plain greedy decoding (the reference's
        semantics, src/inference.rs:160-200, EOS {151643,151645}, 4096
        cap) at any draft quality. Rejected-draft KV slots are
        overwritten by the next iteration's writes before any mask makes
        them attendable (see score_chunk).

        Why: single-stream decode is pinned at the weight-streaming
        floor (bf16 0.6B ~1.7 ms/token reads all 1.2 GB of weights per
        token); the draft streams a quarter of the bytes and the verify
        amortizes one target read over up to k+1 tokens.

        Returns (out_buf, n_gen, n_iterations) — one more element than
        the plain loop; transcribe_batch uses the iteration count to
        report the measured acceptance rate (last_spec_stats).
        """
        k_spec = self.spec_k
        dec = self.decoder_unrolled  # target: score_chunk verify
        d_prefill, d_step, draft_params, d_text_cfg, d_hidden = draft
        idx = jnp.arange(k_spec + 1)

        # draft prefill into the draft's OWN slab (same-checkpoint
        # drafts share the target's injected `hidden`; cross-model
        # drafts arrive with their own)
        dcache = KVCache.zeros(
            d_text_cfg, 1, slab_len(seg_caps[0]), dtype=self.dtype,
            quantized=self.kv_quant,
        )
        _, dcache = d_prefill.prefill(
            draft_params, d_hidden, slots, dcache, true_len[0]
        )

        def body(state):
            # `tok` is the PENDING candidate (same role as the plain
            # loop's carry): the model's argmax successor of everything
            # emitted so far, not yet EOS-checked or emitted, whose KV
            # is not yet in either slab. Its slot is pos.
            cache, dcache, tok, n_gen, done, out_buf, step, iters = state
            pos = true_len[0] + step

            def dbody(carry, i):
                dtok, dc = carry
                ntok, dc = d_step.decode_step_token(
                    draft_params, dtok, pos + i, dc
                )
                return (ntok, dc), ntok

            (_, dcache), dtoks = jax.lax.scan(
                dbody, (tok, dcache), jnp.arange(k_spec + 1)
            )
            drafts = dtoks[:k_spec, 0]  # (k,) d_1..d_k

            block = jnp.concatenate([tok, drafts])[None, :]  # (1, k+1)
            t, cache = dec.score_chunk(dec_params, block, pos, cache)
            e = t[0]  # (k+1,) target greedy successors t_1..t_{k+1}

            match = (drafts == e[:k_spec]).astype(jnp.int32)
            acc = jnp.sum(jnp.cumprod(match))  # accepted drafts, 0..k
            # emission candidates IN SEQUENCE ORDER: the pending token,
            # then the accepted drafts (== their target argmaxes):
            # v = [tok, t_1..t_k], of which v[0..acc] are valid
            v = jnp.concatenate([tok, e[:k_spec]])  # (k+1,)
            cand = idx <= acc
            is_eos = jnp.logical_or(
                v == ENDOFTEXT_TOKEN_ID, v == IM_END_TOKEN_ID
            )
            # sequential semantics: emit candidates up to (excluding)
            # the first EOS, then stop (reference src/inference.rs:152-165)
            no_eos_incl = jnp.cumprod(
                jnp.logical_not(is_eos).astype(jnp.int32)
            ).astype(bool)
            n_emit_raw = jnp.sum((cand & no_eos_incl).astype(jnp.int32))
            eos_hit = n_emit_raw < acc + 1
            n_emit = jnp.minimum(n_emit_raw, jnp.int32(max_new) - step)

            # window write: entries past n_emit are scratch — n_gen only
            # advances by n_emit, and the next window overwrites them
            out_buf = jax.lax.dynamic_update_slice(
                out_buf, v[None, :], (0, n_gen[0])
            )
            n_gen = n_gen + n_emit
            # new pending = t_{acc+1}, the target successor of v[0..acc]
            tok = jax.lax.dynamic_slice_in_dim(e, acc, 1)
            done = jnp.logical_or(done, eos_hit)
            return (cache, dcache, tok, n_gen, done, out_buf,
                    step + n_emit, iters + 1)

        state = (
            cache, dcache, tok0, jnp.zeros((1,), jnp.int32),
            jnp.logical_not(live), out_buf, jnp.int32(0), jnp.int32(0),
        )
        for cap in seg_caps:
            if state[0].max_len < slab_len(cap):
                state = (
                    grow_cache(state[0], slab_len(cap)),
                    grow_cache(state[1], slab_len(cap), d_text_cfg),
                ) + state[2:]

            def cond(state, cap=cap):
                _, _, _, _, done, _, step, _ = state
                return jnp.logical_and(jnp.any(~done), step < cap)

            state = jax.lax.while_loop(cond, body, state)

        _, _, _, n_gen, _, out_buf, _, iters = state
        return out_buf, jnp.minimum(n_gen, max_new), iters

    def _spec_sample_loop(
        self,
        dec_params,
        draft,      # same tuple as _spec_decode_loop
        slots,
        cache,
        tok0,       # (1,) first token (target prefill SAMPLE)
        true_len,
        live,
        out_buf,
        seg_caps,
        slab_len,
        grow_cache,
        max_new: int,
        base_key,      # (2,) uint32 — the sampling graph's PRNG key
        temperature,   # traced f32 scalar
        top_k: int,    # static
        top_p: float,  # static
    ):
        """Speculative SAMPLING (single stream, on device).

        Same draft-and-verify shape as _spec_decode_loop, but stochastic:
        the draft SAMPLES k+1 tokens from its own filtered distribution
        q_i, the target scores the block once for full logits
        (score_chunk(return_logits=True)), and sampling.speculative_accept
        keeps each draft with probability min(1, p_i(d_i)/q_i(d_i)),
        resampling the first rejection from norm(max(p-q, 0)) (bonus
        draw from p_{k+1} when all k are accepted). The emitted sequence
        is distributed EXACTLY as sequential sampling from the target —
        the draft changes speed, never the distribution. Draft and
        target share the filter chain (filtered_probs == what
        sample_token draws from), so a self-draft accepts everything.
        """
        from .sampling import filtered_probs, sample_token, speculative_accept

        k_spec = self.spec_k
        dec = self.decoder_unrolled  # target verify
        d_prefill, d_step, draft_params, d_text_cfg, d_hidden = draft
        idx = jnp.arange(k_spec + 1)

        dcache = KVCache.zeros(
            d_text_cfg, 1, slab_len(seg_caps[0]), dtype=self.dtype,
            quantized=self.kv_quant,
        )
        _, dcache = d_prefill.prefill(
            draft_params, d_hidden, slots, dcache, true_len[0]
        )

        def body(state):
            cache, dcache, tok, n_gen, done, out_buf, step, iters = state
            pos = true_len[0] + step
            # one key per iteration (iters, not step: step advances by a
            # data-dependent amount); +1 keeps clear of the prefill draw
            # at fold_in(base_key, 0)
            key_it = jax.random.fold_in(base_key, iters + 1)

            def dbody(carry, i):
                dtok, dc = carry
                logits, dc = d_step.decode_step(
                    draft_params, dtok, pos + i, dc
                )
                qp = filtered_probs(logits[0], temperature, top_k, top_p)
                ntok = sample_token(
                    logits, jax.random.fold_in(key_it, 2 + i),
                    temperature, top_k, top_p,
                )
                return (ntok, dc), (ntok[0], qp)

            (_, dcache), (dtoks, qps) = jax.lax.scan(
                dbody, (tok, dcache), jnp.arange(k_spec + 1)
            )
            drafts = dtoks[:k_spec]  # (k,)

            block = jnp.concatenate([tok, drafts])[None, :]  # (1, k+1)
            logits_t, cache = dec.score_chunk(
                dec_params, block, pos, cache, return_logits=True
            )
            pp = filtered_probs(
                logits_t[0], temperature, top_k, top_p
            )  # (k+1, V)
            acc, next_tok = speculative_accept(
                jax.random.fold_in(key_it, 0), drafts, qps[:k_spec], pp
            )

            # emission candidates IN SEQUENCE ORDER: the pending token,
            # then the ACCEPTED DRAFTS (the target-distributed tokens
            # here are the drafts themselves; the resample/bonus token
            # becomes the next pending)
            v = jnp.concatenate([tok, drafts])  # (k+1,)
            cand = idx <= acc
            is_eos = jnp.logical_or(
                v == ENDOFTEXT_TOKEN_ID, v == IM_END_TOKEN_ID
            )
            no_eos_incl = jnp.cumprod(
                jnp.logical_not(is_eos).astype(jnp.int32)
            ).astype(bool)
            n_emit_raw = jnp.sum((cand & no_eos_incl).astype(jnp.int32))
            eos_hit = n_emit_raw < acc + 1
            n_emit = jnp.minimum(n_emit_raw, jnp.int32(max_new) - step)

            out_buf = jax.lax.dynamic_update_slice(
                out_buf, v[None, :], (0, n_gen[0])
            )
            n_gen = n_gen + n_emit
            tok = next_tok[None]
            done = jnp.logical_or(done, eos_hit)
            return (cache, dcache, tok, n_gen, done, out_buf,
                    step + n_emit, iters + 1)

        state = (
            cache, dcache, tok0, jnp.zeros((1,), jnp.int32),
            jnp.logical_not(live), out_buf, jnp.int32(0), jnp.int32(0),
        )
        for cap in seg_caps:
            if state[0].max_len < slab_len(cap):
                state = (
                    grow_cache(state[0], slab_len(cap)),
                    grow_cache(state[1], slab_len(cap), d_text_cfg),
                ) + state[2:]

            def cond(state, cap=cap):
                _, _, _, _, done, _, step, _ = state
                return jnp.logical_and(jnp.any(~done), step < cap)

            state = jax.lax.while_loop(cond, body, state)

        _, _, _, n_gen, _, out_buf, _, iters = state
        return out_buf, jnp.minimum(n_gen, max_new), iters

    # ------------------------------------------------------------------ #

    def warmup(self, batch_sizes: Sequence[int] = (1,),
               buckets: Optional[Sequence[int]] = None,
               sampling=None) -> None:
        """Precompile the fused graph for the given buckets/batch sizes.

        Serving deployments call this once at startup so no user request
        pays a compile; with the persistent compilation cache a
        restart's warmup is mostly disk reads. Each (bucket, batch)
        pair is one cached executable, compiled for the engine's real
        max_new (a smaller cap would compile a DIFFERENT graph).

        ``sampling``: warm the SAMPLING variant of each graph instead of
        greedy (a SamplingParams with the deployment's static top_k /
        top_p — temperature is traced, so any value compiles the same
        graph). Deployments that serve both call warmup twice. This
        matters most for speculative engines: the spec-sampling graph is
        the slowest compile in the repo (minutes cold through a remote-
        compile tunnel).

        The warmup dispatch marks every row born-done (live=False), so
        the PRODUCTION graph compiles and runs — mel, encoder, prefill,
        slab-growth copies — but the decode while_loops execute zero
        iterations. Without this, random-weight deployments decoded the
        silent clip to the 4096-token cap, which made warming the
        240/360-chunk long-form buckets take minutes each.
        """
        if buckets is None:
            buckets = list(self.chunk_buckets)
        cf = self.config.audio.chunk_frames
        for c in buckets:
            clip = np.zeros(int(c * cf * 160), np.float32)
            for b in batch_sizes:
                with stage_timer(f"warmup_c{c}_b{b}"):
                    self.transcribe_batch([clip] * b, sampling=sampling,
                                          _warmup=True)
                logger.info("warmed bucket %d chunks, batch %d", c, b)

    def transcribe_samples(
        self,
        samples: np.ndarray,
        language: Optional[str] = None,
        sampling=None,
    ) -> TranscribeResult:
        """Transcribe mono 16 kHz f32 samples (single bucketed dispatch)."""
        return self.transcribe_batch(
            [samples], [language], sampling=sampling
        )[0]

    def transcribe_batch(
        self,
        samples_list: list,
        languages: Optional[list] = None,
        sampling=None,
        _warmup: bool = False,
    ) -> list:
        """Transcribe a batch of utterances in ONE device dispatch.

        All utterances share one audio-length bucket (the max needed), a
        batched KV cache, and a single prefill + decode loop with
        per-example EOS. This is the serving fast path the reference has
        no analog of: decode weight streaming amortizes across the batch.

        ``sampling`` (runtime/sampling.SamplingParams) switches greedy
        argmax for temperature / top-k / top-p sampling on device; None
        or temperature <= 0 is exact greedy (the same compiled graph as
        before the parameter existed).

        ``_warmup`` (internal, see warmup()): dispatch the production
        graph with every row born-done so compilation happens but the
        decode loops run zero iterations.
        """
        from .sampling import normalize

        sampling = normalize(sampling)
        n_real = len(samples_list)
        if n_real == 0:
            return []
        if languages is None:
            languages = [None] * n_real
        if len(languages) != n_real:
            raise ValueError(
                f"languages has {len(languages)} entries for "
                f"{n_real} utterances"
            )
        # batch-size bucketing: pad to the next power of two (duplicating
        # the last utterance) so a serving process compiles O(log B)
        # batched graphs instead of one per exact batch size
        b = 1
        while b < n_real:
            b *= 2
        # dp shard_map needs the batch divisible by the shard count
        dp = self._dp_size()
        if dp > 1:
            b = -(-b // dp) * dp
        if b > n_real:
            # pad rows reuse the last utterance's inputs (keeps every
            # value finite at the shared bucket shape) but are marked
            # not-live: born done in the decode loop, n_gen stays 0
            samples_list = list(samples_list) + [samples_list[-1]] * (
                b - n_real
            )
            languages = list(languages) + [languages[-1]] * (b - n_real)
        live = np.zeros(b, bool)
        if not _warmup:
            live[:n_real] = True
        cf = self.config.audio.chunk_frames
        tpc = self.config.audio.tokens_per_chunk
        from ..config import feat_extract_output_length

        bucket_chunks = max(
            self._pick_bucket(num_mel_frames(len(s))) for s in samples_list
        )
        bucket_frames = bucket_chunks * cf
        p_bucket = self._prompt_bucket(bucket_chunks)

        waves, n_trues, token_ids, true_lens = [], [], [], []
        for samples, language in zip(samples_list, languages):
            wave, n_true = pad_waveform(samples, bucket_frames=bucket_frames)
            full, tail = n_true // cf, n_true % cf
            n_audio = full * tpc + (
                feat_extract_output_length(tail) if tail else 0
            )
            prompt = build_prompt(n_audio, language, self.tokenizer)
            if len(prompt) > p_bucket:
                raise ValueError(
                    "prompt exceeds bucket; language string too long"
                )
            ids = np.zeros(p_bucket, np.int32)
            if b > 1:
                # right-aligned layout (see prefill_aligned): all prompts
                # END at slot p_bucket, so decode writes share one slot
                ids[p_bucket - len(prompt):] = prompt
            else:
                ids[: len(prompt)] = prompt
            waves.append(wave)
            n_trues.append(n_true)
            token_ids.append(ids)
            true_lens.append(len(prompt))
        logger.info(
            "Batch %d: bucket %d chunks, prompt bucket %d",
            b, bucket_chunks, p_bucket,
        )

        sample = not sampling.greedy
        graph = self._graph(
            bucket_chunks, b,
            (sampling.top_k, sampling.top_p) if sample else None,
        )
        extra = ()
        if sample:
            extra = (
                jax.random.PRNGKey(sampling.seed),
                jnp.float32(sampling.temperature),
            )
        kw = {}
        spec = self._spec_active(b, sample)
        if spec:
            kw["draft_params"] = (
                (self.draft_bundle.enc_params, self.draft_bundle.dec_params)
                if self.draft_bundle is not None
                else self.draft_params
            )
        with stage_timer("device_dispatch"):
            out = graph(
                self.enc_params,
                self.dec_params,
                jnp.asarray(np.stack(waves)),
                jnp.asarray(np.asarray(n_trues, np.int32)),
                jnp.asarray(np.stack(token_ids)),
                jnp.asarray(np.asarray(true_lens, np.int32)),
                jnp.asarray(live),
                *extra,
                **kw,
            )
            if spec:
                out_buf, n_gen, n_iters = out
                it = int(np.asarray(n_iters))
                tokens = int(np.asarray(n_gen)[0])
                # emitted per iteration = accepted drafts + 1, so the
                # mean accepted-draft count is (tokens - iters) / iters
                self.last_spec_stats = {
                    "iterations": it,
                    "tokens": tokens,
                    "mean_accepted": (
                        (tokens - it) / it if it else 0.0
                    ),
                }
            else:
                out_buf, n_gen = out
            out_buf = np.asarray(out_buf)
            n_gen = np.asarray(n_gen)

        results = []
        for i, language in enumerate(languages[:n_real]):
            generated = out_buf[i, : int(n_gen[i])].tolist()
            raw = self.tokenizer.decode(generated)
            lang, text = parse_asr_output(raw, language is not None)
            results.append(
                TranscribeResult(text=text, language=lang, raw_output=raw)
            )
        logger.info("Generated %s tokens", n_gen[:n_real].tolist())
        return results

    def transcribe(
        self,
        audio_path: str | Path,
        language: Optional[str] = None,
        segment_seconds: Optional[float] = None,
        overlap_seconds: float = 2.0,
        sampling=None,
    ) -> TranscribeResult:
        """Transcribe an audio file of any length.

        Audio longer than the largest bucket is transcribed in overlapped
        segments stitched at the transcript level (runtime/longform.py).
        Long-form is greedy-only: overlap stitching matches the two
        segments' transcripts at the junction, which stochastic decoding
        would systematically break.
        """
        from .sampling import normalize

        sampling = normalize(sampling)
        samples = load_audio(audio_path, 16000)
        # clamp to bucket capacity: a larger segment_seconds would cut
        # segments no bucket can hold and _pick_bucket would raise
        max_seconds = min(
            segment_seconds or self.max_bucket_seconds,
            self.max_bucket_seconds,
        )
        if len(samples) <= int(max_seconds * 16000):
            from .longform import Segment, attach_words

            r = self.transcribe_samples(samples, language, sampling=sampling)
            seg = attach_words(
                [Segment(0, 0.0, len(samples) / 16000, r.text)]
                if r.text.strip() else []
            )
            return dataclasses.replace(r, segments=seg)
        if not sampling.greedy:
            raise ValueError(
                "sampling is not supported on long-form audio: overlap "
                "stitching needs deterministic transcripts at segment "
                "junctions (pass sampling=None, or transcribe segments "
                "yourself via transcribe_samples)"
            )

        logger.info(
            "Long-form audio (%.1fs): overlapped segments of %.0fs",
            len(samples) / 16000, max_seconds,
        )
        from .longform import transcribe_long

        return transcribe_long(
            self, samples, language,
            segment_seconds=max_seconds,
            overlap_seconds=overlap_seconds,
        )
