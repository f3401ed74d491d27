"""Multi-device tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_rs_tpu.config import tiny_test_config
from qwen3_asr_rs_tpu.models.text_decoder import TextDecoder, init_decoder_params
from qwen3_asr_rs_tpu.parallel.mesh import make_mesh
from qwen3_asr_rs_tpu.parallel.sharding import (
    decoder_param_specs,
    shard_params,
)

requires_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


@requires_8
def test_make_mesh_factorization():
    mesh = make_mesh(n_devices=8, tp_divisor_of=8)
    assert mesh.shape["dp"] * mesh.shape["tp"] == 8
    assert mesh.shape["tp"] == 8  # 8 | 8
    mesh = make_mesh(n_devices=8, tp_divisor_of=2)
    assert mesh.shape["tp"] == 2 and mesh.shape["dp"] == 4
    mesh = make_mesh(n_devices=4, dp=2)
    assert mesh.shape == {"dp": 2, "tp": 2}


@requires_8
def test_tp_sharded_decoder_matches_single_device():
    """TP-sharded forward must be numerically identical to unsharded."""
    cfg = tiny_test_config().text  # 2 kv heads -> tp=2
    params = init_decoder_params(cfg, dtype=jnp.float32)
    dec = TextDecoder(cfg, max_position=64)

    ids = jnp.asarray([[5, 8, 1, 13, 2]], dtype=jnp.int32)
    hidden = dec.embed(params, ids)
    expected = np.asarray(dec.forward_full(params, hidden, jnp.arange(5)))

    mesh = make_mesh(n_devices=8, tp_divisor_of=cfg.num_key_value_heads)
    with mesh:
        sharded = shard_params(params, mesh, decoder_param_specs())
        fn = jax.jit(lambda p, h: dec.forward_full(p, h, jnp.arange(5)))
        got = np.asarray(fn(sharded, dec.embed(sharded, ids)))

    np.testing.assert_allclose(got, expected, atol=1e-4, rtol=1e-4)


@requires_8
def test_dryrun_multichip_entry():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
