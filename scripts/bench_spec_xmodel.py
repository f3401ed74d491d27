"""Cross-model speculative decoding: 0.6B drafting for the 1.7B target.

The real-checkpoint pairing this framework ships for (engine
``draft_model=``): the 0.6B checkpoint streams ~1/3 of the 1.7B's
weight bytes per draft token, and one 1.7B verify call scores all k
drafts. Output is bit-identical to plain 1.7B greedy at ANY acceptance.

Synthetic gaussian weights make two DIFFERENT architectures agree on
essentially nothing, so this script measures the envelope instead:

  * plain 1.7B bf16 (the baseline to beat),
  * FLOOR: independent random 0.6B draft (acceptance ~0 — every
    iteration pays k draft steps + one verify for ~1 emitted token),
  * CEILING: both models with ``final_ln_w = 0`` — all logits are
    exactly zero, every argmax (draft steps, verify score) is token 0,
    acceptance = 1.0 at FULL compute cost on both sides. This is the
    honest upper bound for this draft at this k: real-weight acceptance
    lands between floor and ceiling (eval_fixtures --compare decides).

Usage: python scripts/bench_spec_xmodel.py [quick]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

WARMUP = 1
ITERS = 3


def _engine(config, params, draft_model=None, draft_quant=None,
            spec_k=4, max_new=128):
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine

    class _Tok:
        def encode(self, text):
            return [101] * 4

        def decode(self, ids):
            return ""

    return AsrEngine(
        model_dir=None, dtype=jnp.bfloat16, max_new_tokens=max_new,
        chunk_buckets=(30,), config=config, params=params,
        tokenizer=_Tok(), speculative=draft_quant, spec_k=spec_k,
        draft_model=draft_model,
    )


def _run(eng, seconds=30.0):
    rng = np.random.default_rng(0)
    clip = (rng.standard_normal(int(16000 * seconds)) * 0.1).astype(
        np.float32
    )
    for _ in range(WARMUP):
        eng.transcribe_samples(clip)
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        eng.transcribe_samples(clip)
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    return med, (eng.last_spec_stats or {})


def _report(tag, t, st=None):
    extra = ""
    if st:
        extra = (
            f", mean accepted {st.get('mean_accepted', 0):.2f} "
            f"({st.get('iterations')} iters / {st.get('tokens')} tok)"
        )
    print(f"{tag}: {t*1000:.1f} ms ({30.0/t:.1f}x){extra}", flush=True)


def main():
    quick = "quick" in sys.argv[1:]
    import jax
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.config import AsrConfig, synthetic_17b_config
    from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
    from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params

    print(f"devices: {jax.devices()}", file=sys.stderr)
    big = synthetic_17b_config()
    small = AsrConfig()  # 0.6B defaults

    enc17 = init_encoder_params(big.audio, dtype=jnp.bfloat16)
    dec17 = init_decoder_params(big.text, dtype=jnp.bfloat16)
    enc06 = init_encoder_params(small.audio, dtype=jnp.bfloat16, seed=3)
    dec06 = init_decoder_params(small.text, dtype=jnp.bfloat16, seed=3)

    eng = _engine(big, (enc17, dec17))
    t_plain, _ = _run(eng)
    _report("1.7B bf16 plain", t_plain)
    del eng

    # FLOOR: independent random draft, acceptance ~0
    sweep = [(None, 4)] if quick else [(None, 4), ("int4", 4)]
    for dq, k in sweep:
        eng = _engine(
            big, (enc17, dec17),
            draft_model=(small, (enc06, dec06)),
            draft_quant=dq, spec_k=k,
        )
        t, st = _run(eng)
        _report(f"FLOOR 0.6B-{dq or 'bf16'} draft k={k}", t, st)
        del eng

    # CEILING: zero final_ln_w on BOTH models -> all logits exactly 0,
    # every argmax is token 0, acceptance 1.0 at full compute cost
    dec17_c = dict(dec17)
    dec17_c["final_ln_w"] = jnp.zeros_like(dec17["final_ln_w"])
    dec06_c = dict(dec06)
    dec06_c["final_ln_w"] = jnp.zeros_like(dec06["final_ln_w"])
    for dq, k in ([(None, 4)] if quick else
                  [(None, 4), (None, 8), ("int4", 4)]):
        eng = _engine(
            big, (enc17, dec17_c),
            draft_model=(small, (enc06, dec06_c)),
            draft_quant=dq, spec_k=k,
        )
        t, st = _run(eng)
        _report(f"CEILING 0.6B-{dq or 'bf16'} draft k={k}", t, st)
        if st.get("mean_accepted", 0) < (k - 0.5):
            print(
                "  WARNING: ceiling acceptance below k — argmax "
                "tie-breaking differs between draft step and verify",
                flush=True,
            )
        del eng


if __name__ == "__main__":
    main()
