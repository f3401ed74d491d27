"""Quality evaluation: transcribe the reference fixtures, score WER/CER.

Run in an environment with real Qwen3-ASR weights:

    python scripts/eval_fixtures.py /path/to/Qwen3-ASR-0.6B
    python scripts/eval_fixtures.py /path/to/Qwen3-ASR-0.6B --compare

Exercises the exact reference CI contract (sample{1,2,3}.wav with expected
transcripts alongside) and reports WER (English) / CER (Chinese) plus
exact-match, which is the transcript-parity bar from BASELINE.md.

``--compare`` runs every precision config (float32, bfloat16, lm8,
int8, int4 weight-only) and reports the per-fixture WER/CER DELTA of
each against float32 — the harness for validating that bf16/int8 serving is
quality-safe before enabling it in production.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402

from qwen3_asr_rs_tpu.runtime.engine import AsrEngine  # noqa: E402
from qwen3_asr_rs_tpu.utils.wer import cer, wer  # noqa: E402

FIXTURE_DIR = Path(
    os.environ.get("ASR_FIXTURES", "/root/reference/test_audio")
)

CONFIGS = {
    "float32": dict(dtype=jnp.float32, quantize=None),
    "bfloat16": dict(dtype=jnp.bfloat16, quantize=None),
    "lm8": dict(dtype=jnp.bfloat16, quantize="lm8"),
    "int8": dict(dtype=jnp.bfloat16, quantize="int8"),
    "int4": dict(dtype=jnp.bfloat16, quantize="int4"),
}
QUANT_TAGS = ("bfloat16", "lm8", "int8", "int4")


def score(expected: str, got: str) -> tuple[str, float]:
    is_cjk = any("一" <= c <= "鿿" for c in expected)
    if is_cjk:
        return "CER", cer(expected, got)
    return "WER", wer(expected, got)


def run_config(model_dir: str, tag: str, wavs):
    """Transcribe all fixtures with one engine config; returns results."""
    engine = AsrEngine(model_dir, **CONFIGS[tag])
    out = {}
    for wav in wavs:
        expected_path = wav.with_suffix(".txt")
        expected = (
            expected_path.read_text().strip()
            if expected_path.exists()
            else None
        )
        result = engine.transcribe(str(wav))
        out[wav.name] = (expected, result)
    del engine
    return out


def report(tag: str, results) -> bool:
    all_ok = True
    print(f"\n===== {tag}")
    for name, (expected, result) in results.items():
        print(f"== {name}")
        print(f"   language: {result.language}")
        print(f"   text:     {result.text}")
        if expected is not None:
            metric, s = score(expected, result.text)
            exact = result.text.strip() == expected
            print(f"   expected: {expected}")
            print(f"   {metric}: {s:.3f}  exact_match: {exact}")
            all_ok &= exact
    return all_ok


def main():
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 1
    model_dir = sys.argv[1]
    compare = "--compare" in sys.argv[2:]
    # --assert-exact is the default single-config behavior (exit 2 on
    # any non-exact float32 transcript); accepted for explicitness.

    wavs = sorted(FIXTURE_DIR.glob("*.wav"))
    if not wavs:
        print(f"no fixtures in {FIXTURE_DIR}", file=sys.stderr)
        return 1

    if not compare:
        results = run_config(model_dir, "float32", wavs)
        ok = report("float32", results)
        print(f"\nexact transcript parity: {'PASS' if ok else 'FAIL'}")
        return 0 if ok else 2

    all_results = {
        tag: run_config(model_dir, tag, wavs) for tag in CONFIGS
    }
    ok = report("float32", all_results["float32"])
    for tag in QUANT_TAGS:
        report(tag, all_results[tag])

    print("\n===== precision deltas vs float32")
    for name, (expected, base) in all_results["float32"].items():
        if expected is None:
            continue
        metric, s0 = score(expected, base.text)
        row = [f"{name}: f32 {metric} {s0:.3f}"]
        for tag in QUANT_TAGS:
            _, s = score(expected, all_results[tag][name][1].text)
            row.append(f"{tag} {s:.3f} (delta {s - s0:+.3f})")
        print("   " + " | ".join(row))
    print(f"\nfloat32 exact transcript parity: {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 2


if __name__ == "__main__":
    raise SystemExit(main())
