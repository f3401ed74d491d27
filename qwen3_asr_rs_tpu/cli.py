"""``asr`` command-line interface.

Contract-compatible with the reference binary (src/main.rs:7-81):

    asr <model_path> <audio_file> [language]

prints exactly:

    Language: <lang>
    Text: <text>

Logging level comes from ``ASR_LOG`` (or ``RUST_LOG`` for drop-in
compatibility with the reference), default ``info``.
"""

from __future__ import annotations

import logging
import os
import sys
from pathlib import Path

USAGE = """\
Qwen3 ASR (TPU-native) - Automatic Speech Recognition

Usage: asr <model_path> <audio_file> [language]
       asr <model_path> <audio_file>... [--language LANG]

Arguments:
  model_path   Path to the Qwen3-ASR model directory
  audio_file   Path to the input audio file (WAV and, via the native
               libav decoder or an ffmpeg binary, any other format)
  language     Optional: force language (e.g., chinese, english, japanese).
               With a single audio file the third positional argument is
               the language (exact reference semantics); with several
               audio files (one batched TPU dispatch) use --language.

Options (extensions beyond the reference binary):
  --temperature T   Stochastic decode (default 0 = greedy argmax, the
                    reference's semantics). Not available for audio
                    longer than the largest bucket (long-form stitching
                    needs deterministic transcripts).
  --top-k K         With --temperature: sample among the K most likely
                    tokens only (0 = disabled).
  --top-p P         With --temperature: nucleus sampling mass (1.0 =
                    disabled).
  --seed N          PRNG seed for --temperature (default 0).
  --timestamps      After the Text: line, print one `[start - end] text`
                    line per time-stamped segment (long-form audio gets
                    one per stitched chunk, short audio a single span),
                    each followed by indented per-word `[start - end]`
                    lines (length-proportional within the segment).
  --draft MODE      Speculative decoding: draft with a quantized copy of
                    the checkpoint (int4 | int4g | int8 | lm8 | bf16)
                    and verify with the full model — output is
                    BIT-IDENTICAL to plain greedy decoding, only faster
                    when the draft agrees often. With --temperature,
                    speculative SAMPLING preserves the target's sampling
                    distribution exactly. Single-file only.
  --draft-model DIR Cross-model speculative decoding: draft with a
                    SMALLER checkpoint (e.g. 0.6B drafting for a 1.7B
                    model). Combine with --draft to also quantize the
                    draft (e.g. --draft-model 0.6B --draft int4).
                    Output stays bit-identical to plain greedy.
  --draft-k N       Draft tokens per verify call (default 4).

The audio file will be automatically converted to mono 16kHz f32 for the
model.

Environment variables:
  ASR_LOG / RUST_LOG   Set logging level (e.g., info, debug)
  ASR_MAX_NEW_TOKENS   Cap on generated tokens (default 4096)
  ASR_DTYPE            Compute dtype: bfloat16 (default) or float32
"""


def setup_logging():
    level_name = (
        os.environ.get("ASR_LOG") or os.environ.get("RUST_LOG") or "info"
    )
    level = getattr(logging, level_name.split(",")[0].upper(), logging.INFO)
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        stream=sys.stderr,
    )


def main(argv=None) -> int:
    setup_logging()
    argv = list(sys.argv[1:] if argv is None else argv)

    if len(argv) < 2:
        print(USAGE, file=sys.stderr)
        return 1

    model_path = argv[0]
    # Reference-compatible positional contract (src/main.rs:37-39):
    # `asr <model> <audio> [language]`. Extension: several audio files
    # (one batched TPU dispatch) with `--language LANG` to force a
    # language unambiguously. The positional language applies only in
    # the exact reference shape (two trailing args, the second not an
    # existing file); the one genuinely ambiguous case — a file named
    # like a language — gets a warning instead of a silent guess.
    language = None
    sample_opts = {"temperature": 0.0, "top-k": 0, "top-p": 1.0, "seed": 0}
    timestamps = False
    draft = None
    draft_model = None
    draft_k = 4
    rest = []
    it = iter(argv[1:])
    for arg in it:
        if arg == "--timestamps":
            timestamps = True
        elif arg == "--draft" or arg.startswith("--draft="):
            draft = (
                arg.split("=", 1)[1] if "=" in arg else next(it, None)
            )
            if draft is None:
                print("Error: --draft needs a value", file=sys.stderr)
                return 1
        elif arg == "--draft-model" or arg.startswith("--draft-model="):
            draft_model = (
                arg.split("=", 1)[1] if "=" in arg else next(it, None)
            )
            if draft_model is None:
                print("Error: --draft-model needs a value", file=sys.stderr)
                return 1
        elif arg == "--draft-k" or arg.startswith("--draft-k="):
            val = arg.split("=", 1)[1] if "=" in arg else next(it, None)
            try:
                draft_k = int(val)
            except (TypeError, ValueError):
                print(f"Error: bad --draft-k value {val!r}",
                      file=sys.stderr)
                return 1
        elif arg in ("--language", "-l"):
            language = next(it, None)
            if language is None:
                print("Error: --language needs a value", file=sys.stderr)
                return 1
        elif arg.startswith("--language="):
            language = arg.split("=", 1)[1]
        elif arg.startswith("--") and arg.lstrip("-").split("=")[0] in (
            sample_opts
        ):
            name, eq, val = arg.lstrip("-").partition("=")
            if not eq:
                val = next(it, None)
            if val is None:
                print(f"Error: --{name} needs a value", file=sys.stderr)
                return 1
            try:
                cast = int if name in ("top-k", "seed") else float
                sample_opts[name] = cast(val)
            except ValueError:
                print(f"Error: bad --{name} value {val!r}", file=sys.stderr)
                return 1
        else:
            rest.append(arg)
    if language is None and len(rest) == 2:
        if not Path(rest[1]).exists():
            language = rest.pop()
        elif "." not in Path(rest[1]).name:
            logging.getLogger("asr").warning(
                "treating %r as an audio file because it exists; pass "
                "--language %s if you meant to force a language",
                rest[1], rest[1],
            )
    audio_files = rest
    for f in audio_files:
        if not Path(f).exists():
            print(f"Error: Audio file not found: {f}", file=sys.stderr)
            return 1

    if not Path(model_path).exists():
        print(f"Error: Model directory not found: {model_path}",
              file=sys.stderr)
        return 1
    if not audio_files:
        print("Error: no audio file given", file=sys.stderr)
        return 1

    import jax
    import jax.numpy as jnp

    from .runtime.engine import AsrEngine

    logger = logging.getLogger("asr")
    logger.info("JAX devices: %s", jax.devices())

    dtype = (
        jnp.float32
        if os.environ.get("ASR_DTYPE", "").lower() in ("float32", "f32")
        else jnp.bfloat16
    )
    max_new = int(os.environ.get("ASR_MAX_NEW_TOKENS", "4096"))
    quantize = os.environ.get("ASR_QUANT") or None

    if draft is not None and draft not in (
        "int4", "int4g", "int8", "lm8", "bf16"
    ):
        print(
            f"Error: unknown --draft mode {draft!r} "
            "(expected int4 | int4g | int8 | lm8 | bf16)",
            file=sys.stderr,
        )
        return 1
    if draft_model is not None and not Path(draft_model).exists():
        print(f"Error: draft model directory not found: {draft_model}",
              file=sys.stderr)
        return 1
    if (draft is not None or draft_model is not None) and (
        len(audio_files) > 1
    ):
        logging.getLogger("asr").warning(
            "--draft/--draft-model apply to single-file decoding only; "
            "batched requests use the plain decode loop"
        )

    engine = AsrEngine(
        model_path, dtype=dtype, max_new_tokens=max_new, quantize=quantize,
        speculative=draft, spec_k=draft_k, draft_model=draft_model,
    )

    def finish():
        metrics_path = os.environ.get("ASR_METRICS")
        if metrics_path:
            from .utils.tracing import dump_metrics

            dump_metrics(metrics_path)

    from .errors import AsrError
    from .runtime.sampling import SamplingParams

    sampling = None
    if sample_opts["temperature"] != 0 or any(
        sample_opts[k] != d
        for k, d in (("top-k", 0), ("top-p", 1.0), ("seed", 0))
    ):
        # constructed (and validated) whenever ANY sampling flag was
        # given: a negative --temperature or a --top-k without
        # --temperature must error/warn, not silently decode greedily
        try:
            sampling = SamplingParams(
                temperature=sample_opts["temperature"],
                top_k=sample_opts["top-k"],
                top_p=sample_opts["top-p"],
                seed=sample_opts["seed"],
            ).validate()
        except ValueError as e:
            print(f"Error: {e}", file=sys.stderr)
            return 1
        if sampling.greedy:
            logger.warning(
                "--top-k/--top-p/--seed have no effect without "
                "--temperature > 0; decoding greedily"
            )
            sampling = None

    try:
        if len(audio_files) == 1:
            logger.info("Transcribing: %s", audio_files[0])
            result = engine.transcribe(
                audio_files[0], language, sampling=sampling
            )
            print(f"Language: {result.language}")
            print(f"Text: {result.text}")
            if timestamps:
                for s in result.segments or []:
                    print(f"[{s.start:.2f} - {s.end:.2f}] {s.text.strip()}")
                    for w in s.words or []:
                        print(f"  [{w.start:.2f} - {w.end:.2f}] {w.word}")
            if engine.last_spec_stats:
                st = engine.last_spec_stats
                logger.info(
                    "speculative decode: %d tokens in %d iterations "
                    "(mean accepted drafts %.2f of %d)",
                    st["tokens"], st["iterations"],
                    st["mean_accepted"], draft_k,
                )
            finish()
            return 0

        logger.info("Transcribing %d files as one batch", len(audio_files))
        from .audio.load import load_audio

        samples = [load_audio(f, 16000) for f in audio_files]
        results = engine.transcribe_batch(
            samples, [language] * len(samples), sampling=sampling
        )
        from .runtime.longform import Segment, attach_words

        for f, s, result in zip(audio_files, samples, results):
            print(f"File: {f}")
            print(f"Language: {result.language}")
            print(f"Text: {result.text}")
            if timestamps:
                # same Segment construction as engine.transcribe: one
                # whole-file span when the transcript is non-empty (the
                # batch path has no long-form stitching, so there is
                # exactly one span per file)
                segs = attach_words(
                    [Segment(0, 0.0, len(s) / 16000, result.text)]
                    if result.text.strip() else []
                )
                for seg in segs:
                    print(
                        f"[{seg.start:.2f} - {seg.end:.2f}] "
                        f"{seg.text.strip()}"
                    )
                    for w in seg.words or []:
                        print(f"  [{w.start:.2f} - {w.end:.2f}] {w.word}")
        finish()
        return 0
    except (AsrError, ValueError) as e:
        # framework errors (undecodable audio, bad checkpoint,
        # sampling on long-form audio, ...) get a clean one-line
        # message instead of a traceback
        print(f"Error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
