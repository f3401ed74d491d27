"""End-to-end engine test on a tiny synthetic model.

Runs the full fused graph (mel -> encoder -> injection -> prefill ->
on-device greedy while_loop) and cross-checks every generated token
against a torch pipeline that reproduces the reference's transcribe()
control flow (src/inference.rs:89-213) step by step.
"""

import jax.numpy as jnp
import numpy as np
import torch

from qwen3_asr_rs_tpu.config import feat_extract_output_length, tiny_test_config
from qwen3_asr_rs_tpu.features.mel import num_mel_frames
from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params
from qwen3_asr_rs_tpu.runtime.engine import AsrEngine
from qwen3_asr_rs_tpu.runtime.prompt import (
    AUDIO_OFFSET,
    build_prompt,
    parse_asr_output,
)

import torch_ref
from test_mel import torch_reference_logmel
import pytest

pytestmark = pytest.mark.slow  # heavy parity/e2e: quick tier skips


class MockTokenizer:
    def encode(self, text):
        return [100 + (ord(c) % 50) for c in text]

    def decode(self, ids):
        return " ".join(str(i) for i in ids)


def _np(params):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), params)


def make_engine(max_new=6):
    cfg = tiny_test_config()
    # real vocab size so the actual special-token ids are embeddable
    import dataclasses

    text = dataclasses.replace(cfg.text, vocab_size=151936)
    cfg = dataclasses.replace(
        cfg, thinker_config=dataclasses.replace(cfg.thinker_config,
                                                text_config=text)
    )
    enc_params = init_encoder_params(cfg.audio, dtype=jnp.float32)
    dec_params = init_decoder_params(cfg.text, dtype=jnp.float32)
    eng = AsrEngine(
        model_dir=None,
        dtype=jnp.float32,
        max_new_tokens=max_new,
        chunk_buckets=(2, 4, 8),
        config=cfg,
        params=(enc_params, dec_params),
        tokenizer=MockTokenizer(),
    )
    return eng, cfg, enc_params, dec_params


def torch_pipeline(cfg, enc_params, dec_params, samples, language, max_new,
                   tokenizer):
    """Reference-style transcribe: per-token host loop with concat cache."""
    tcfg = cfg.text
    mel = torch.from_numpy(
        torch_reference_logmel(samples, n_mels=cfg.audio.num_mel_bins)
    )
    enc = torch_ref.TorchAudioEncoder(cfg.audio, _np(enc_params))
    audio_embeds = enc.forward(mel)  # (n_audio, output_dim)
    n_audio = audio_embeds.shape[0]

    prompt = build_prompt(n_audio, language, tokenizer)
    seq = len(prompt)
    dec = torch_ref.TorchTextDecoder(tcfg, _np(dec_params))
    hidden = dec.embed(prompt)[None]
    hidden[0, AUDIO_OFFSET : AUDIO_OFFSET + n_audio] = audio_embeds

    sections = list(tcfg.mrope_section())
    cos, sin = torch_ref.mrope_cos_sin(
        [list(range(seq))] * 3, tcfg.head_dim, tcfg.rope_theta, sections,
        tcfg.mrope_interleaved(),
    )
    cache = [None] * tcfg.num_hidden_layers
    logits = dec.forward(hidden, cos, sin, cache, torch_ref.causal_mask(seq, 0))
    next_logits = logits[0, seq - 1]

    generated = []
    pos = seq
    for _ in range(max_new):
        tok = int(next_logits.argmax())
        if tok in (151643, 151645):
            break
        generated.append(tok)
        cos, sin = torch_ref.mrope_cos_sin(
            [[pos]] * 3, tcfg.head_dim, tcfg.rope_theta, sections,
            tcfg.mrope_interleaved(),
        )
        h = dec.embed([tok])[None]
        out = dec.forward(h, cos, sin, cache, torch_ref.causal_mask(1, pos))
        next_logits = out[0, -1]
        pos += 1
    return generated


def test_engine_matches_torch_pipeline(rng):
    eng, cfg, enc_params, dec_params = make_engine(max_new=6)
    samples = (rng.standard_normal(16000) * 0.1).astype(np.float32)  # 1 s

    result = eng.transcribe_samples(samples, language=None)
    got = [int(t) for t in result.raw_output.split()] if result.raw_output else []

    ref = torch_pipeline(
        cfg, enc_params, dec_params, samples, None, 6, MockTokenizer()
    )
    assert got == ref


def test_engine_forced_language(rng):
    eng, cfg, enc_params, dec_params = make_engine(max_new=4)
    samples = (rng.standard_normal(24000) * 0.1).astype(np.float32)

    result = eng.transcribe_samples(samples, language="english")
    assert result.language == "forced"
    ref = torch_pipeline(
        cfg, enc_params, dec_params, samples, "english", 4, MockTokenizer()
    )
    got = [int(t) for t in result.raw_output.split()] if result.raw_output else []
    assert got == ref


def test_engine_bucket_consistency(rng):
    # same audio through different buckets must produce identical tokens
    eng, cfg, enc_params, dec_params = make_engine(max_new=4)
    samples = (rng.standard_normal(18000) * 0.1).astype(np.float32)

    r_small = eng.transcribe_samples(samples)
    eng2 = AsrEngine(
        model_dir=None, dtype=jnp.float32, max_new_tokens=4,
        chunk_buckets=(8,), config=cfg,
        params=(enc_params, dec_params), tokenizer=MockTokenizer(),
    )
    r_big = eng2.transcribe_samples(samples)
    assert r_small.raw_output == r_big.raw_output


def test_engine_batch_matches_single(rng):
    """Batched dispatch must generate the same tokens as per-utterance."""
    cfg = make_engine()[1]
    enc_params = init_encoder_params(cfg.audio, dtype=jnp.float32)
    dec_params = init_decoder_params(cfg.text, dtype=jnp.float32)

    def engine(buckets):
        return AsrEngine(
            model_dir=None, dtype=jnp.float32, max_new_tokens=4,
            chunk_buckets=buckets, config=cfg,
            params=(enc_params, dec_params), tokenizer=MockTokenizer(),
        )

    eng = engine((4,))  # one bucket so single/batch shapes match exactly
    a = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    b = (rng.standard_normal(30000) * 0.1).astype(np.float32)

    singles = [eng.transcribe_samples(a), eng.transcribe_samples(b)]
    batch = eng.transcribe_batch([a, b])
    assert [r.raw_output for r in batch] == [r.raw_output for r in singles]

    # odd batch sizes are padded up to the next power of two and the
    # padding results dropped
    batch3 = eng.transcribe_batch([a, b, a])
    assert len(batch3) == 3
    assert (4, 4, None) in eng._graphs  # padded batch-4 greedy graph
    assert [r.raw_output for r in batch3] == [
        singles[0].raw_output, singles[1].raw_output, singles[0].raw_output,
    ]


def test_engine_batch_pad_slots_born_done(rng):
    """Padding rows of an odd-size batch must generate ZERO tokens.

    transcribe_batch pads to the next power of two; the pad rows carry
    live=False into the fused graph and start the decode loop done, so
    they never extend the while_loop or count generated tokens."""
    eng = make_engine(max_new=4)[0]
    a = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    from qwen3_asr_rs_tpu.features.mel import pad_waveform

    cfg = eng.config
    cf = cfg.audio.chunk_frames
    wave, n_true = pad_waveform(a, bucket_frames=2 * cf)
    n_audio = (n_true // cf) * cfg.audio.tokens_per_chunk
    tail = n_true % cf
    if tail:
        n_audio += feat_extract_output_length(tail)
    prompt = build_prompt(n_audio, None, eng.tokenizer)
    p_bucket = eng._prompt_bucket(2)
    ids = np.zeros(p_bucket, np.int32)
    ids[p_bucket - len(prompt):] = prompt  # right-aligned (batch > 1)

    graph = eng._graph(2, 4)
    out_buf, n_gen = graph(
        eng.enc_params,
        eng.dec_params,
        jnp.asarray(np.stack([wave] * 4)),
        jnp.asarray([n_true] * 4, jnp.int32),
        jnp.asarray(np.stack([ids] * 4)),
        jnp.asarray([len(prompt)] * 4, jnp.int32),
        jnp.asarray([True, True, True, False]),
    )
    n_gen = np.asarray(n_gen)
    assert n_gen[3] == 0, f"pad slot generated {n_gen[3]} tokens"
    assert (n_gen[:3] == n_gen[0]).all() and n_gen[0] > 0
    # live rows produce identical tokens (same input), pad row none
    out_buf = np.asarray(out_buf)
    assert (out_buf[1, : n_gen[1]] == out_buf[0, : n_gen[0]]).all()


def test_engine_kernel_decode_attention_matches_dense(rng, monkeypatch):
    """Forced Pallas decode-attention path == dense path, token-for-token."""
    cfg = make_engine()[1]
    enc_params = init_encoder_params(cfg.audio, dtype=jnp.float32)
    dec_params = init_decoder_params(cfg.text, dtype=jnp.float32)

    def engine():
        return AsrEngine(
            model_dir=None, dtype=jnp.float32, max_new_tokens=4,
            chunk_buckets=(2,), config=cfg,
            params=(enc_params, dec_params), tokenizer=MockTokenizer(),
        )

    a = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    b = (rng.standard_normal(20000) * 0.1).astype(np.float32)

    monkeypatch.setenv("ASR_DECODE_ATTN", "dense")
    dense_single = engine().transcribe_samples(a)
    dense_batch = engine().transcribe_batch([a, b])

    monkeypatch.setenv("ASR_DECODE_ATTN", "kernel")
    kern_eng = engine()
    kern_single = kern_eng.transcribe_samples(a)
    kern_batch = kern_eng.transcribe_batch([a, b])

    assert kern_single.raw_output == dense_single.raw_output
    assert [r.raw_output for r in kern_batch] == [
        r.raw_output for r in dense_batch
    ]


def test_parse_asr_output():
    assert parse_asr_output("language English<asr_text>Hello.", False) == (
        "English", "Hello.",
    )
    assert parse_asr_output("anything here", True) == ("forced", "anything here")
    assert parse_asr_output("no prefix", False) == ("unknown", "no prefix")
    lang, text = parse_asr_output("language Chinese, text", False)
    assert lang == "Chinese"


def test_prompt_token_ids():
    # exact template ids (src/inference.rs:220-244)
    p = build_prompt(3, None, None)
    assert p == [
        151644, 8948, 198, 151645, 198, 151644, 872, 198, 151669,
        151676, 151676, 151676,
        151670, 151645, 198, 151644, 77091, 198,
    ]
    assert p[AUDIO_OFFSET] == 151676
