"""Measure encoder+prefill vs per-token decode cost on the real chip."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(decode_tokens):
    import jax
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.config import AsrConfig, feat_extract_output_length
    from qwen3_asr_rs_tpu.features.mel import pad_waveform
    from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
    from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params
    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine
    from qwen3_asr_rs_tpu.runtime.prompt import build_prompt

    config = AsrConfig()
    enc_params = init_encoder_params(config.audio, dtype=jnp.bfloat16)
    dec_params = init_decoder_params(config.text, dtype=jnp.bfloat16)

    class _Tok:
        def encode(self, text):
            return [101]

        def decode(self, ids):
            return ""

    num_chunks = 30
    engine = AsrEngine(
        model_dir=None, dtype=jnp.bfloat16, max_new_tokens=decode_tokens,
        chunk_buckets=(num_chunks,), config=config,
        params=(enc_params, dec_params), tokenizer=_Tok(),
    )
    rng = np.random.default_rng(0)
    samples = (rng.standard_normal(16000 * 30) * 0.1).astype(np.float32)
    cf = config.audio.chunk_frames
    wave, n_true = pad_waveform(samples, bucket_frames=num_chunks * cf)
    tpc = config.audio.tokens_per_chunk
    n_audio = (n_true // cf) * tpc
    prompt = build_prompt(n_audio, None, None)
    token_ids = np.zeros(engine._prompt_bucket(num_chunks), np.int32)
    token_ids[: len(prompt)] = prompt
    graph = engine._graph(num_chunks, 1)
    args = (engine.enc_params, engine.dec_params, jnp.asarray(wave)[None],
            jnp.asarray([n_true], jnp.int32), jnp.asarray(token_ids)[None],
            jnp.asarray([len(prompt)], jnp.int32), jnp.asarray([True]))
    out, n = graph(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        out, n = graph(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    print(f"decode_tokens={decode_tokens}: median {med*1000:.1f} ms "
          f"(all {[round(t*1000,1) for t in times]})", file=sys.stderr)
    return med


if __name__ == "__main__":
    t1 = run(1)
    t128 = run(128)
    print(f"prefill+encoder ~= {t1*1000:.1f} ms", file=sys.stderr)
    print(f"per-token decode ~= {(t128-t1)/127*1000:.3f} ms", file=sys.stderr)
