"""Speculative-decode sweep at the 0.6B architecture on one chip.

Measures 30 s / 128-token single-stream greedy transcription for:
  * plain bf16 (the target baseline the spec path must beat),
  * spec with int4 / int4g / int8 drafts at several k,
  * the CEILING: an engine whose TARGET weights are the dequantized
    int4 weights (bf16), drafted by the int4 weights themselves —
    acceptance is ~1.0 at int4 draft cost, i.e. the best number the
    machinery can produce at this draft speed. (Synthetic gaussian
    weights give pessimistic draft agreement — real checkpoints decide
    the deployed draft mode; the ceiling row bounds the opportunity.)

Usage: python scripts/bench_spec.py [quick] [17b]
       (``17b`` benches the synthetic 1.7B config — where the bf16
       target is slowest and drafting buys the most)
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

WARMUP = 1
ITERS = 3


def _engine(config, params, speculative=None, spec_k=4, max_new=128):
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
        tokenizer=_Tok(), speculative=speculative, spec_k=spec_k,
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
    st = eng.last_spec_stats or {}
    return med, st


def main():
    quick = "quick" in sys.argv[1:]
    big = "17b" in sys.argv[1:]
    import jax
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.config import AsrConfig, synthetic_17b_config
    from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
    from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params

    print(f"devices: {jax.devices()}", file=sys.stderr)
    config = synthetic_17b_config() if big else AsrConfig()
    enc = init_encoder_params(config.audio, dtype=jnp.bfloat16)
    dec = init_decoder_params(config.text, dtype=jnp.bfloat16)

    rows = []

    eng = _engine(config, (enc, dec))
    t, _ = _run(eng)
    rows.append(("bf16 plain", t, None))
    print(f"bf16 plain: {t*1000:.1f} ms  ({30.0/t:.1f}x)", flush=True)
    del eng

    sweep = [("int4", 4)] if quick else [
        ("int4", 2), ("int4", 4), ("int4", 8),
        ("int4g", 4), ("int8", 4),
    ]
    for draft, k in sweep:
        eng = _engine(config, (enc, dec), speculative=draft, spec_k=k)
        t, st = _run(eng)
        rows.append((f"spec {draft} k={k}", t, st))
        print(
            f"spec {draft} k={k}: {t*1000:.1f} ms ({30.0/t:.1f}x), "
            f"mean accepted {st.get('mean_accepted', 0):.2f}, "
            f"{st.get('iterations')} iters for {st.get('tokens')} tok",
            flush=True,
        )
        del eng

    # ceiling: target = dequantized int4 (bf16), draft = the int4 copy
    # (int8 lm_head on both sides, dequantized exactly for the target).
    # The two compute near-identical argmaxes, so acceptance ~1 at int4
    # draft speed — the best case for this machinery at k.
    from qwen3_asr_rs_tpu.weights.quantize import quantize_decoder_params

    dec_q4 = quantize_decoder_params(dec, bits=4, merge=True, lm_bits=8)

    def _dequant(dec_q4, ref):
        """Materialize bf16 weights equal to the int4 model's values."""
        import jax.numpy as jnp

        out = dict(ref)
        layers = dict(ref["layers"])
        q = dec_q4["layers"]

        def unpack(p4, s):
            p = p4.astype(jnp.int32)
            lo = ((p << 28) >> 28).astype(jnp.float32)
            hi = (p >> 4).astype(jnp.float32)
            w = jnp.concatenate([lo, hi], axis=-1)
            return (w * s[..., None, :]).astype(jnp.bfloat16)

        # merged qkv/gateup: split back to per-projection names
        nq_d = ref["layers"]["q_w"].shape[2]
        nkv_d = ref["layers"]["k_w"].shape[2]
        inter = ref["layers"]["gate_w"].shape[2]
        qkv = unpack(q["qkv_w_q4"], q["qkv_w_s"])
        layers["q_w"], layers["k_w"], layers["v_w"] = (
            qkv[..., :nq_d], qkv[..., nq_d:nq_d + nkv_d],
            qkv[..., nq_d + nkv_d:],
        )
        gu = unpack(q["gateup_w_q4"], q["gateup_w_s"])
        layers["gate_w"], layers["up_w"] = gu[..., :inter], gu[..., inter:]
        layers["o_w"] = unpack(q["o_w_q4"], q["o_w_s"])
        layers["down_w"] = unpack(q["down_w_q4"], q["down_w_s"])
        out["layers"] = layers
        # int8 lm_head (H, V): dequantize exactly so target logits use
        # the same values the draft's int8 matvec computes
        lm = (
            dec_q4["lm_head_q"].astype(jnp.float32)
            * dec_q4["lm_head_s"].astype(jnp.float32)
        )
        out["lm_head"] = jnp.transpose(lm).astype(jnp.bfloat16)  # (V, H)
        return out

    dec_ceiling = _dequant(dec_q4, dec)
    eng = _engine(config, (enc, dec_ceiling), speculative="int4", spec_k=4)
    t, st = _run(eng)
    print(
        f"CEILING (dequant-int4 target, int4 draft, k=4): {t*1000:.1f} ms "
        f"({30.0/t:.1f}x), mean accepted {st.get('mean_accepted', 0):.2f}",
        flush=True,
    )
    if not quick:
        eng2 = _engine(config, (enc, dec_ceiling), speculative="int4",
                       spec_k=8)
        t, st = _run(eng2)
        print(
            f"CEILING k=8: {t*1000:.1f} ms ({30.0/t:.1f}x), "
            f"mean accepted {st.get('mean_accepted', 0):.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
