"""int4 group-wise A/B on the real chip: decode cost + argmax agreement.

Two questions (round-3 verdict item 5):
  1. What does the grouped-scale decode path cost vs per-channel int4?
     (int4g runs batched per-group dots through the scan path — the
     megakernel's post-dot per-column scale apply does not commute with
     K-varying scales.)
  2. Does grouping rescue the stepwise argmax agreement vs bf16?
     (round 3 measured per-channel int4 at 2% on synthetic weights —
     the quality red flag that motivated int4g.)

Agreement is teacher-forced on the bf16 decoder's own greedy tokens:
both decoders see identical prefixes, so disagreement measures logits
divergence, not compounding drift. Synthetic-weight agreement is a
smoke signal only — real-weight WER deltas (make verify-real) decide.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STEPS = 64
PREFIX = 32


def _engines(quant_modes):
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.config import AsrConfig
    from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
    from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params
    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine

    config = AsrConfig()
    enc_params = init_encoder_params(config.audio, dtype=jnp.bfloat16)
    dec_params = init_decoder_params(config.text, dtype=jnp.bfloat16)

    class _Tok:
        def encode(self, t):
            return [101]

        def decode(self, ids):
            return ""

    for q in quant_modes:
        yield q, AsrEngine(
            model_dir=None, dtype=jnp.bfloat16, max_new_tokens=128,
            chunk_buckets=(30,), config=config,
            params=(enc_params, dec_params), tokenizer=_Tok(),
            quantize=q,
        )


def throughput(engine, tag):
    rng = np.random.default_rng(0)
    clip = (rng.standard_normal(16000 * 30) * 0.1).astype(np.float32)
    engine.transcribe_samples(clip)  # compile
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        engine.transcribe_samples(clip)
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    print(
        f"{tag}: median {med * 1000:.1f} ms -> {30 / med:.1f}x RT "
        f"({[round(t * 1000, 1) for t in times]})"
    )
    return 30 / med


def agreement():
    """Teacher-forced stepwise argmax agreement vs bf16."""
    import jax
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.config import AsrConfig
    from qwen3_asr_rs_tpu.models.text_decoder import (
        KVCache,
        TextDecoder,
        init_decoder_params,
    )
    from qwen3_asr_rs_tpu.weights.quantize import quantize_decoder_params

    cfg = AsrConfig().text
    params = init_decoder_params(cfg, dtype=jnp.bfloat16)
    dec = TextDecoder(cfg, max_position=PREFIX + STEPS + 8)

    variants = {
        "int8": quantize_decoder_params(params, bits=8),
        "int4": quantize_decoder_params(params, bits=4),
        "int4g128": quantize_decoder_params(
            params, bits=4, group_size=128, lm_bits=8
        ),
        "int4g64": quantize_decoder_params(
            params, bits=4, group_size=64, lm_bits=8
        ),
    }

    rng = np.random.default_rng(0)
    prefix = jnp.asarray(
        rng.integers(1000, 50000, (1, PREFIX)).astype(np.int32)
    )

    def make_run(p):
        def prefill(p_):
            cache = KVCache.zeros(
                cfg, 1, PREFIX + STEPS + 8, dtype=jnp.bfloat16
            )
            hidden = dec.embed(p_, prefix)
            logits, cache = dec.prefill(
                p_, hidden, jnp.arange(PREFIX), cache, jnp.int32(PREFIX)
            )
            return logits, cache

        def step(p_, tok, pos, cache):
            return dec.decode_step(p_, tok, pos, cache)

        return jax.jit(prefill), jax.jit(step)

    # bf16 greedy teacher sequence
    prefill_bf, step_bf = make_run(params)
    logits, cache_bf = prefill_bf(params)
    toks = [int(np.asarray(jnp.argmax(logits, -1))[0])]
    for i in range(STEPS - 1):
        logits, cache_bf = step_bf(
            params, jnp.asarray([toks[-1]], jnp.int32),
            jnp.int32(PREFIX + i), cache_bf,
        )
        toks.append(int(np.asarray(jnp.argmax(logits, -1))[0]))

    for name, qp in variants.items():
        prefill_q, step_q = make_run(qp)
        logits, cache_q = prefill_q(qp)
        agree = int(np.asarray(jnp.argmax(logits, -1))[0] == toks[0])
        for i in range(STEPS - 1):
            # teacher-forced: feed the bf16 token regardless of match
            logits, cache_q = step_q(
                qp, jnp.asarray([toks[i]], jnp.int32),
                jnp.int32(PREFIX + i), cache_q,
            )
            agree += int(np.asarray(jnp.argmax(logits, -1))[0] == toks[i + 1])
        print(
            f"agreement {name}: {agree}/{STEPS} "
            f"({100 * agree / STEPS:.0f}%) vs bf16 argmax"
        )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "agree"):
        agreement()
    if which in ("all", "xrt"):
        for q, eng in _engines(["int4g", "int4"]):
            throughput(eng, f"quantize={q}")
