"""Flash-attention kernel parity vs the dense XLA path (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_rs_tpu.ops.attention import dense_attention
from qwen3_asr_rs_tpu.ops.pallas.flash_attention import flash_attention

pytestmark = pytest.mark.slow  # heavy parity/e2e: quick tier skips


def _mask_from(kv_valid, causal, b, sq, sk):
    import numpy as np

    m = np.zeros((b, 1, sq, sk), np.float32)
    j = np.arange(sk)
    if kv_valid is not None:
        for i in range(b):
            m[i, 0, :, :] += np.where(j >= kv_valid[i], -1e9, 0.0)
    if causal:
        i_idx = np.arange(sq)[:, None]
        m += np.where(j[None, :] > i_idx, -1e9, 0.0)[None, None]
    return jnp.asarray(m)


@pytest.mark.parametrize(
    "b,sq,sk,hq,hkv,d,causal,valid",
    [
        (1, 128, 128, 4, 2, 128, True, None),       # GQA causal (prefill)
        (2, 256, 256, 4, 4, 64, False, [100, 256]),  # MHA + prefix validity
        (3, 104, 104, 2, 2, 64, False, [104, 50, 0]),  # encoder windows
        (1, 200, 200, 8, 2, 128, True, [150]),      # causal + validity
        (2, 64, 192, 4, 2, 64, False, None),        # cross lengths
    ],
)
def test_flash_matches_dense(rng, b, sq, sk, hq, hkv, d, causal, valid):
    q = jnp.asarray(rng.standard_normal((b, sq, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, sk, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, sk, hkv, d)), jnp.float32)
    kv_valid = None if valid is None else jnp.asarray(valid, jnp.int32)

    out = flash_attention(
        q, k, v, kv_valid, causal=causal, interpret=True
    )
    ref = dense_attention(
        q, k, v, mask=_mask_from(valid, causal, b, sq, sk)
    )
    got = np.asarray(out)
    want = np.asarray(ref)
    # rows that can attend to nothing are garbage in both paths; compare
    # only rows with at least one live key
    for i in range(b):
        limit = sk if valid is None else valid[i]
        for qi in range(sq):
            live = min(limit, qi + 1) if causal else limit
            if live <= 0:
                continue
            np.testing.assert_allclose(
                got[i, qi], want[i, qi], atol=2e-5, rtol=1e-4,
                err_msg=f"b={i} q={qi}",
            )


def test_flash_kv_start_matches_dense(rng):
    """Left-padding (kv_start) masking parity between flash and dense."""
    from qwen3_asr_rs_tpu.ops.attention import attention

    b, sq, sk, h, d = 2, 128, 128, 2, 64
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, sk, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, sk, h, d)), jnp.float32)
    start = jnp.asarray([20, 0], jnp.int32)

    flash = flash_attention(q, k, v, None, start, causal=True,
                            interpret=True)
    dense = attention(q, k, v, causal=True, kv_start=start, impl="dense")
    got = np.asarray(flash)
    want = np.asarray(dense)
    for i in range(b):
        for qi in range(int(start[i]), sq):  # rows with >= 1 live key
            np.testing.assert_allclose(
                got[i, qi], want[i, qi], atol=2e-5, rtol=1e-4,
                err_msg=f"b={i} q={qi}",
            )


def test_flash_odd_block_boundaries(rng):
    # Sq/Sk not multiples of the block size exercise edge masking
    b, sq, sk, h, d = 1, 130, 130, 2, 64
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, sk, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, sk, h, d)), jnp.float32)
    out = flash_attention(q, k, v, causal=True, interpret=True,
                          block_q=64, block_k=64)
    ref = dense_attention(q, k, v, mask=_mask_from(None, True, b, sq, sk))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_auto_dispatch_is_batch_aware(monkeypatch):
    """The memory guard triggers on total score-tensor BYTES: a batch-8
    3k-token prefill materializes the same scores as a batch-1 9k one."""
    from qwen3_asr_rs_tpu.ops.attention import auto_attention_impl

    monkeypatch.delenv("ASR_ATTN_THRESHOLD", raising=False)
    # B=1 below the 4096 B=1-equivalent threshold -> dense
    assert auto_attention_impl(1, 16, 3072, 3072, True) == "dense"
    # same sequence at batch 8 -> 8x the scores -> flash
    assert auto_attention_impl(8, 16, 3072, 3072, True) == "flash"
    # B=1 at the old 360 s bucket scale -> flash
    assert auto_attention_impl(1, 16, 9000, 9000, True) == "flash"
    # never flash off-TPU
    assert auto_attention_impl(8, 16, 9000, 9000, False) == "dense"
