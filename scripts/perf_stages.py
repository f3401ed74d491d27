"""Per-stage timing on the real chip: mel, encoder, prefill, decode-step."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.config import AsrConfig
    from qwen3_asr_rs_tpu.features.mel import (
        LogMelFrontend, log_mel_from_padded, pad_waveform,
    )
    from qwen3_asr_rs_tpu.models.audio_encoder import (
        AudioEncoder, init_encoder_params,
    )
    from qwen3_asr_rs_tpu.models.text_decoder import (
        KVCache, TextDecoder, init_decoder_params,
    )

    config = AsrConfig()
    enc_params = init_encoder_params(config.audio, dtype=jnp.bfloat16)
    dec_params = init_decoder_params(config.text, dtype=jnp.bfloat16)
    encoder = AudioEncoder(config.audio)
    decoder = TextDecoder(config.text, max_position=8192)
    frontend = LogMelFrontend()

    num_chunks = 30
    cf = config.audio.chunk_frames
    rng = np.random.default_rng(0)
    samples = (rng.standard_normal(16000 * 30) * 0.1).astype(np.float32)
    wave, n_true = pad_waveform(samples, bucket_frames=num_chunks * cf)
    wave_d = jnp.asarray(wave)

    mel_fn = jax.jit(
        lambda w, n: log_mel_from_padded(w, n, frontend.mel_filters)
    )
    t_mel = timeit(mel_fn, wave_d, jnp.int32(n_true))
    print(f"mel: {t_mel*1000:.2f} ms", file=sys.stderr)

    mel = mel_fn(wave_d, jnp.int32(n_true))
    enc_fn = jax.jit(lambda p, m, n: encoder(p, m, n))
    t_enc = timeit(enc_fn, enc_params, mel, jnp.int32(n_true))
    print(f"encoder: {t_enc*1000:.2f} ms", file=sys.stderr)

    p_len = 448
    s_max = p_len + 129
    hidden = jnp.asarray(
        rng.standard_normal((1, p_len, config.text.hidden_size)) * 0.02,
        jnp.bfloat16,
    )

    def prefill_fn(dp, h):
        cache = KVCache.zeros(config.text, 1, s_max, dtype=jnp.bfloat16)
        return decoder.prefill(dp, h, jnp.arange(p_len), cache,
                               jnp.int32(p_len - 5))

    pf = jax.jit(prefill_fn)
    t_pf = timeit(pf, dec_params, hidden)
    print(f"prefill (P={p_len}): {t_pf*1000:.2f} ms", file=sys.stderr)

    _, cache = pf(dec_params, hidden)

    def step_fn(dp, tok, pos, c):
        return decoder.decode_step(dp, tok, pos, c)

    sf = jax.jit(step_fn, donate_argnums=(3,))
    tok = jnp.asarray([17], jnp.int32)
    out = sf(dec_params, tok, jnp.int32(p_len), cache)
    jax.block_until_ready(out)
    cache = out[1]
    ts = []
    for i in range(20):
        t0 = time.perf_counter()
        logits, cache = sf(dec_params, tok, jnp.int32(p_len + 1 + i), cache)
        jax.block_until_ready(logits)
        ts.append(time.perf_counter() - t0)
    t_step = sorted(ts)[len(ts) // 2]
    print(f"decode step (donated cache): {t_step*1000:.3f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
