"""Decoder parity tests vs the torch oracle (reference math)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from qwen3_asr_rs_tpu.config import tiny_test_config
from qwen3_asr_rs_tpu.models.text_decoder import (
    KVCache,
    TextDecoder,
    init_decoder_params,
)
from qwen3_asr_rs_tpu.ops.rotary import RotaryTable

import torch_ref
import pytest


def _np_params(params):
    return jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), params)


def test_rotary_table_matches_reference_mrope():
    head_dim = 64
    sections = (12, 10, 10)
    for interleaved in (False, True):
        table = RotaryTable(
            head_dim, 1e6, sections, interleaved=interleaved, max_position=512
        )
        pos = np.stack(
            [np.arange(17), np.arange(17) + 3, np.arange(17) * 2]
        ).astype(np.int32)
        cos, sin = table.lookup(jnp.asarray(pos))
        rcos, rsin = torch_ref.mrope_cos_sin(
            pos.tolist(), head_dim, 1e6, list(sections), interleaved
        )
        np.testing.assert_allclose(np.asarray(cos), rcos.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(sin), rsin.numpy(), atol=1e-6)


def test_forward_full_matches_torch():
    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    dec = TextDecoder(cfg, max_position=256)

    ids = np.array([[3, 17, 200, 5, 999, 42, 7]], dtype=np.int32)
    seq = ids.shape[1]
    hidden = dec.embed(params, jnp.asarray(ids))
    logits = dec.forward_full(params, hidden, jnp.arange(seq))

    tref = torch_ref.TorchTextDecoder(cfg, _np_params(params))
    cos, sin = torch_ref.mrope_cos_sin(
        [list(range(seq))] * 3,
        cfg.head_dim,
        cfg.rope_theta,
        list(cfg.mrope_section()),
        cfg.mrope_interleaved(),
    )
    cache = [None] * cfg.num_hidden_layers
    h0 = tref.embed(ids[0])[None]
    ref_logits = tref.forward(h0, cos, sin, cache, torch_ref.causal_mask(seq, 0))

    np.testing.assert_allclose(
        np.asarray(logits), ref_logits.numpy(), atol=2e-4, rtol=1e-3
    )


@pytest.mark.slow
def test_prefill_plus_decode_matches_torch_incremental():
    """Slab-cache prefill + decode steps == concat-cache reference."""
    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    dec = TextDecoder(cfg, max_position=256)

    prompt = np.array([[3, 17, 200, 5]], dtype=np.int32)
    p = prompt.shape[1]
    max_len = 16

    # --- JAX: prefill with a padded bucket, then 3 decode steps
    pad_to = 8
    padded = np.zeros((1, pad_to), np.int32)
    padded[:, :p] = prompt
    hidden = dec.embed(params, jnp.asarray(padded))
    cache = KVCache.zeros(cfg, 1, max_len, dtype=jnp.float32)
    logits, cache = dec.prefill(
        params, hidden, jnp.arange(pad_to), cache, jnp.int32(p)
    )
    jax_logits = [np.asarray(logits)[0]]
    next_tok = int(np.argmax(jax_logits[-1]))
    toks = [next_tok]
    for step in range(3):
        logits, cache = dec.decode_step(
            params,
            jnp.asarray([toks[-1]], dtype=jnp.int32),
            jnp.int32(p + step),
            cache,
        )
        jax_logits.append(np.asarray(logits)[0])
        toks.append(int(np.argmax(jax_logits[-1])))

    # --- torch reference: prefill then per-token forwards with concat cache
    tref = torch_ref.TorchTextDecoder(cfg, _np_params(params))
    tcache = [None] * cfg.num_hidden_layers
    cos, sin = torch_ref.mrope_cos_sin(
        [list(range(p))] * 3, cfg.head_dim, cfg.rope_theta,
        list(cfg.mrope_section()), cfg.mrope_interleaved(),
    )
    h0 = tref.embed(prompt[0])[None]
    ref = tref.forward(h0, cos, sin, tcache, torch_ref.causal_mask(p, 0))
    ref_logits = [ref[0, -1].numpy()]
    rtoks = [int(ref_logits[-1].argmax())]
    for step in range(3):
        pos = p + step
        cos, sin = torch_ref.mrope_cos_sin(
            [[pos]] * 3, cfg.head_dim, cfg.rope_theta,
            list(cfg.mrope_section()), cfg.mrope_interleaved(),
        )
        h = tref.embed([rtoks[-1]])[None]
        out = tref.forward(
            h, cos, sin, tcache, torch_ref.causal_mask(1, pos)
        )
        ref_logits.append(out[0, -1].numpy())
        rtoks.append(int(ref_logits[-1].argmax()))

    assert toks == rtoks
    for jl, rl in zip(jax_logits, ref_logits):
        np.testing.assert_allclose(jl, rl, atol=2e-4, rtol=1e-3)


def test_untied_lm_head():
    cfg = tiny_test_config().text
    cfg = type(cfg)(**{**cfg.__dict__, "tie_word_embeddings": False})
    params = init_decoder_params(cfg, dtype=jnp.float32)
    assert params["lm_head"] is not params["embed"]
    dec = TextDecoder(cfg, max_position=64)
    hidden = dec.embed(params, jnp.asarray([[1, 2]], dtype=jnp.int32))
    logits = dec.forward_full(params, hidden, jnp.arange(2))
    assert logits.shape == (1, 2, cfg.vocab_size)


@pytest.mark.slow
def test_prefill_chunk_matches_full_prefill(rng):
    """Chunked prefill (history + causal fresh block) == one-shot prefill."""
    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    dec = TextDecoder(cfg, max_position=64)

    ids = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (1, 12)), dtype=jnp.int32
    )
    hidden = dec.embed(params, ids)

    full_cache = KVCache.zeros(cfg, 1, 32, dtype=jnp.float32)
    full_logits, full_cache = dec.prefill(
        params, hidden, jnp.arange(12), full_cache, jnp.int32(12)
    )

    # same sequence in three chunks of 5 + 4 + 3
    cache = KVCache.zeros(cfg, 1, 32, dtype=jnp.float32)
    off = 0
    for n in (5, 4, 3):
        logits, cache = dec.prefill_chunk(
            params, hidden[:, off:off + n], jnp.int32(off), cache,
            jnp.int32(n),
        )
        off += n

    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full_logits), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(cache.k[..., :12, :]), np.asarray(full_cache.k[..., :12, :]),
        atol=1e-5, rtol=1e-5,
    )
    # chunked cache then decodes identically
    tok = jnp.asarray([7], jnp.int32)
    l1, _ = dec.decode_step(params, tok, jnp.int32(12), full_cache)
    l2, _ = dec.decode_step(params, tok, jnp.int32(12), cache)
    np.testing.assert_allclose(
        np.asarray(l2), np.asarray(l1), atol=1e-4, rtol=1e-4
    )


def test_prefill_chunk_padded_tail(rng):
    """Garbage chunk rows past true_len must not corrupt logits at
    true_len-1 (streaming buckets pad the chunk)."""
    cfg = tiny_test_config().text
    params = init_decoder_params(cfg, dtype=jnp.float32)
    dec = TextDecoder(cfg, max_position=64)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 8)), jnp.int32)
    hidden = dec.embed(params, ids)

    cache = KVCache.zeros(cfg, 1, 32, dtype=jnp.float32)
    exact, _ = dec.prefill_chunk(
        params, hidden, jnp.int32(0), cache, jnp.int32(8)
    )
    padded = jnp.concatenate(
        [hidden, jnp.full((1, 4, hidden.shape[-1]), 99.0)], axis=1
    )
    cache2 = KVCache.zeros(cfg, 1, 32, dtype=jnp.float32)
    got, _ = dec.prefill_chunk(
        params, padded, jnp.int32(0), cache2, jnp.int32(8)
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(exact), atol=1e-5, rtol=1e-5
    )
