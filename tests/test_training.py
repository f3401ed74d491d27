"""Training step + checkpoint/resume tests (single device, tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qwen3_asr_rs_tpu.config import tiny_test_config
from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params
from qwen3_asr_rs_tpu.runtime.prompt import AUDIO_OFFSET
from qwen3_asr_rs_tpu.training.train_step import TrainState, make_train_step

pytestmark = pytest.mark.slow  # heavy parity/e2e: quick tier skips


def make_batch(cfg, b, rng, num_chunks=2):
    cf = cfg.audio.chunk_frames
    p_len = AUDIO_OFFSET + num_chunks * cfg.audio.tokens_per_chunk + 16
    return {
        "mel": rng.standard_normal(
            (b, cfg.audio.num_mel_bins, num_chunks * cf)
        ).astype(np.float32),
        "n_frames": np.full((b,), num_chunks * cf, np.int32),
        "n_audio": np.full(
            (b,), num_chunks * cfg.audio.tokens_per_chunk, np.int32
        ),
        "token_ids": rng.integers(0, cfg.text.vocab_size, (b, p_len)).astype(
            np.int32
        ),
        "loss_mask": np.concatenate(
            [
                np.zeros((b, p_len - 9), np.float32),
                np.ones((b, 8), np.float32),
                np.zeros((b, 1), np.float32),
            ],
            axis=1,
        ),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    params = {
        "encoder": init_encoder_params(cfg.audio, dtype=jnp.float32),
        "decoder": init_decoder_params(cfg.text, dtype=jnp.float32),
    }
    optimizer = optax.adamw(1e-3)
    state = TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.int32(0),
    )
    step_fn = jax.jit(make_train_step(cfg, optimizer, max_position=256))
    return cfg, state, step_fn


def test_loss_decreases_on_repeated_batch(setup, rng):
    cfg, state, step_fn = setup
    batch = make_batch(cfg, 2, rng)
    losses = []
    for _ in range(8):
        state, loss = step_fn(state, batch)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_checkpoint_roundtrip(setup, rng, tmp_path):
    from qwen3_asr_rs_tpu.training.checkpoint import (
        restore_train_state,
        save_train_state,
    )

    cfg, state, step_fn = setup
    batch = make_batch(cfg, 2, rng)
    state, _ = step_fn(state, batch)

    save_train_state(tmp_path / "ckpt", state)
    template = jax.tree_util.tree_map(np.zeros_like, state)
    restored = restore_train_state(tmp_path / "ckpt", template)

    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resumed training continues identically
    s1, l1 = step_fn(state, batch)
    s2, l2 = step_fn(restored, batch)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_remat_matches_no_remat(rng):
    """jax.checkpoint'ed layers give the same loss and gradients."""
    cfg = tiny_test_config()
    params = {
        "encoder": init_encoder_params(cfg.audio, dtype=jnp.float32),
        "decoder": init_decoder_params(cfg.text, dtype=jnp.float32),
    }
    batch = make_batch(cfg, 2, np.random.default_rng(0))
    opt = optax.sgd(1e-3)
    outs = {}
    for remat in (False, True):
        step = make_train_step(cfg, opt, max_position=256, remat=remat)
        state = TrainState(
            params=params, opt_state=opt.init(params), step=jnp.int32(0)
        )
        new_state, loss = jax.jit(step)(state, batch)
        outs[remat] = (float(loss), new_state.params)
    assert outs[False][0] == pytest.approx(outs[True][0], rel=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        outs[False][1], outs[True][1],
    )
