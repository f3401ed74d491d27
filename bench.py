"""Benchmark: Qwen3-ASR-0.6B greedy transcription throughput on one chip.

Measures the full fused pipeline (log-mel -> audio encoder -> prefill ->
greedy decode loop on device) on a 30 s clip with synthetic bf16 weights at
the exact 0.6B architecture, decoding DECODE_TOKENS tokens (a realistic
transcript length for 30 s of speech; random weights never emit EOS, so the
loop runs to the cap — an upper bound on real decode work, making the
number conservative).

Prints one JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md); vs_baseline is measured
against the north-star target of 100x real-time per chip.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

AUDIO_SECONDS = 30.0
DECODE_TOKENS = 128
WARMUP = 1
ITERS = 5
NORTH_STAR_XRT = 100.0


def main():
    import jax
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.config import AsrConfig, feat_extract_output_length
    from qwen3_asr_rs_tpu.features.mel import pad_waveform
    from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
    from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params
    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine
    from qwen3_asr_rs_tpu.runtime.prompt import build_prompt

    config = AsrConfig()  # 0.6B defaults
    print(f"devices: {jax.devices()}", file=sys.stderr)

    enc_params = init_encoder_params(config.audio, dtype=jnp.bfloat16)
    dec_params = init_decoder_params(config.text, dtype=jnp.bfloat16)

    class _Tok:
        def encode(self, text):
            return [101] * 4

        def decode(self, ids):
            return ""

    num_chunks = int(AUDIO_SECONDS)  # 1 chunk == 1 s
    engine = AsrEngine(
        model_dir=None,
        dtype=jnp.bfloat16,
        max_new_tokens=DECODE_TOKENS,
        chunk_buckets=(num_chunks,),
        config=config,
        params=(enc_params, dec_params),
        tokenizer=_Tok(),
    )

    rng = np.random.default_rng(0)
    samples = (rng.standard_normal(int(16000 * AUDIO_SECONDS)) * 0.1).astype(
        np.float32
    )
    cf = config.audio.chunk_frames
    wave, n_true = pad_waveform(samples, bucket_frames=num_chunks * cf)

    tpc = config.audio.tokens_per_chunk
    n_audio = (n_true // cf) * tpc
    if n_true % cf:
        n_audio += feat_extract_output_length(n_true % cf)
    prompt = build_prompt(n_audio, None, None)
    p_bucket = engine._prompt_bucket(num_chunks)
    token_ids = np.zeros(p_bucket, np.int32)
    token_ids[: len(prompt)] = prompt

    graph = engine._graph(num_chunks, 1)
    args = (
        engine.enc_params,
        engine.dec_params,
        jnp.asarray(wave)[None],
        jnp.asarray([n_true], jnp.int32),
        jnp.asarray(token_ids)[None],
        jnp.asarray([len(prompt)], jnp.int32),
    )

    # warmup / compile. NOTE: results are fetched to host each run —
    # through the tunneled-TPU transport only a host fetch truly
    # synchronizes, and the fetch is part of honest end-to-end latency.
    for _ in range(WARMUP):
        out, n_gen = graph(*args)
        np.asarray(out)
    n_generated = int(np.asarray(n_gen)[0])
    print(f"compiled; generated {n_generated} tokens/run", file=sys.stderr)

    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        out, n_gen = graph(*args)
        np.asarray(out)
        times.append(time.perf_counter() - t0)

    median = sorted(times)[len(times) // 2]
    xrt = AUDIO_SECONDS / median
    result = {
        "metric": "throughput_0.6B_greedy_30s_128tok",
        "value": round(xrt, 2),
        "unit": "audio_sec_per_sec_per_chip (xRT)",
        "vs_baseline": round(xrt / NORTH_STAR_XRT, 3),
    }
    print(
        f"times: {[round(t*1000,1) for t in times]} ms, median {median*1000:.1f} ms",
        file=sys.stderr,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
