"""bench.py's workload with int8 weight-only quantization (opt-in mode).

Same measurement protocol as the headline bench (30 s clip, 128 greedy
tokens, pre-staged device args, host fetch per iteration); the decoder
weights are int8 with in-megakernel dequant. Quality note: int8 is
near-lossless on Qwen-class models but should be WER-validated on real
weights before production use — hence not the headline number.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

AUDIO_SECONDS = 30.0
DECODE_TOKENS = 128


def main():
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.config import AsrConfig
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

    num_chunks = int(AUDIO_SECONDS)
    engine = AsrEngine(
        model_dir=None, dtype=jnp.bfloat16, max_new_tokens=DECODE_TOKENS,
        chunk_buckets=(num_chunks,), config=config,
        params=(enc_params, dec_params), tokenizer=_Tok(),
        quantize="int8",
    )
    rng = np.random.default_rng(0)
    samples = (rng.standard_normal(int(16000 * AUDIO_SECONDS)) * 0.1).astype(
        np.float32
    )
    cf = config.audio.chunk_frames
    wave, n_true = pad_waveform(samples, bucket_frames=num_chunks * cf)
    tpc = config.audio.tokens_per_chunk
    prompt = build_prompt((n_true // cf) * tpc, None, None)
    token_ids = np.zeros(engine._prompt_bucket(num_chunks), np.int32)
    token_ids[: len(prompt)] = prompt

    graph = engine._graph(num_chunks, 1)
    args = (
        engine.enc_params, engine.dec_params,
        jnp.asarray(wave)[None], jnp.asarray([n_true], jnp.int32),
        jnp.asarray(token_ids)[None], jnp.asarray([len(prompt)], jnp.int32),
        jnp.asarray([True]),
    )
    out, _ = graph(*args)
    np.asarray(out)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out, _ = graph(*args)
        np.asarray(out)
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    print(json.dumps({
        "metric": "throughput_0.6B_int8_greedy_30s_128tok",
        "value": round(AUDIO_SECONDS / med, 2),
        "unit": "audio_sec_per_sec_per_chip (xRT)",
        "times_ms": [round(t * 1000, 1) for t in times],
    }))


if __name__ == "__main__":
    main()
