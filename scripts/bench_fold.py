"""A/B: lm-head folding (prepared operands) vs separate lm matvec+argmax.

Round-2 measured ASR_FOLD_LM=1 SLOWER (int8 0.95 -> 1.45 ms/token) and
blamed per-tile argmax VPU work; the real suspect is the in-call
transpose/pad of the full lm_head landing in the decode loop body
(prepare_lm_fold hoists it explicitly). This reruns the A/B with
prepared operands: 128-token decode loop in ONE jit, fetch once,
subtract a calibrated no-op fetch (NOTES.md methodology).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STEPS = 128
S_MAX, P = 704, 448


def rtt_s():
    import jax.numpy as jnp

    x = jnp.zeros((8,), jnp.int32)
    _ = np.asarray(x)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(x + 1)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def run(quantize, fold):
    import jax
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.config import AsrConfig
    from qwen3_asr_rs_tpu.models.text_decoder import (
        KVCache, TextDecoder, init_decoder_params,
    )
    from qwen3_asr_rs_tpu.ops.pallas.decode_layer import prepare_lm_fold

    cfg = AsrConfig().text
    params = init_decoder_params(cfg, dtype=jnp.bfloat16)
    if quantize:
        from qwen3_asr_rs_tpu.weights.quantize import quantize_decoder_params

        params = quantize_decoder_params(
            params, bits=8 if quantize == "int8" else 4
        )
    if fold:  # "prepared" or "legacy"
        os.environ["ASR_FOLD_LM"] = "1"
        if fold == "prepared":
            lm = params.get("lm_head", params.get("lm_head_q"))
            if lm is None:
                return None
            w, s = prepare_lm_fold(lm, params.get("lm_head_s"))
            params = dict(params)
            params["lm_fold_w"] = w
            params["lm_fold_s"] = s
    else:
        os.environ.pop("ASR_FOLD_LM", None)

    dec = TextDecoder(cfg, max_position=1024)
    rng = np.random.default_rng(0)
    cache = KVCache.zeros(cfg, 1, S_MAX, dtype=jnp.bfloat16)
    cache = KVCache(
        k=jnp.asarray(rng.standard_normal(cache.k.shape) * 0.1,
                      jnp.bfloat16),
        v=jnp.asarray(rng.standard_normal(cache.v.shape) * 0.1,
                      jnp.bfloat16),
    )

    @jax.jit
    def loop(params, cache, tok):
        def body(s):
            cache, tok, i = s
            tok, cache = dec.decode_step_token(
                params, tok, jnp.int32(P) + i, cache
            )
            return cache, tok, i + 1

        _, tok, _ = jax.lax.while_loop(
            lambda s: s[2] < STEPS, body, (cache, tok, jnp.int32(0))
        )
        return tok

    tok = jnp.asarray([42], jnp.int32)
    _ = np.asarray(loop(params, cache, tok))  # compile
    base = rtt_s()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(loop(params, cache, tok))
        ts.append(time.perf_counter() - t0)
    per_tok = (min(ts) - base) / STEPS * 1000
    label = quantize or "bf16"
    print(f"{label:5s} fold={fold or 0}: {per_tok:.3f} ms/token "
          f"(raw {[round(t*1000) for t in ts]}, rtt {base*1000:.0f} ms)")
    return per_tok


def main():
    budget = float(os.environ.get("ASR_BENCH_BUDGET_S", "1200"))
    t0 = time.time()
    out = {}
    for q in (None, "int8"):
        for fold in (False, "prepared", "legacy"):
            if time.time() - t0 > budget:
                print("budget exhausted")
                break
            out[(q, fold)] = run(q, fold)
    for (q, fold), v in out.items():
        if v is not None:
            print(f"RESULT {q or 'bf16'} fold={fold or 0} {v:.3f} ms/token")


if __name__ == "__main__":
    main()
