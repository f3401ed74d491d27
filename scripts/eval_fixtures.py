"""Quality evaluation: transcribe the reference fixtures, score WER/CER.

Run in an environment with real Qwen3-ASR weights:

    python scripts/eval_fixtures.py /path/to/Qwen3-ASR-0.6B

Exercises the exact reference CI contract (sample{1,2,3}.wav with expected
transcripts alongside) and reports WER (English) / CER (Chinese) plus
exact-match, which is the transcript-parity bar from BASELINE.md.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qwen3_asr_rs_tpu.runtime.engine import AsrEngine  # noqa: E402
from qwen3_asr_rs_tpu.utils.wer import cer, wer  # noqa: E402

FIXTURE_DIR = Path(
    os.environ.get("ASR_FIXTURES", "/root/reference/test_audio")
)


def main():
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 1
    engine = AsrEngine(sys.argv[1])

    wavs = sorted(FIXTURE_DIR.glob("*.wav"))
    if not wavs:
        print(f"no fixtures in {FIXTURE_DIR}", file=sys.stderr)
        return 1

    all_ok = True
    for wav in wavs:
        expected_path = wav.with_suffix(".txt")
        expected = (
            expected_path.read_text().strip()
            if expected_path.exists()
            else None
        )
        result = engine.transcribe(str(wav))
        print(f"== {wav.name}")
        print(f"   language: {result.language}")
        print(f"   text:     {result.text}")
        if expected is not None:
            is_cjk = any("一" <= c <= "鿿" for c in expected)
            score = cer(expected, result.text) if is_cjk else wer(
                expected, result.text
            )
            metric = "CER" if is_cjk else "WER"
            exact = result.text.strip() == expected
            print(f"   expected: {expected}")
            print(f"   {metric}: {score:.3f}  exact_match: {exact}")
            all_ok &= exact
    print(f"\nexact transcript parity: {'PASS' if all_ok else 'FAIL'}")
    return 0 if all_ok else 2


if __name__ == "__main__":
    raise SystemExit(main())
