"""Persistent compilation cache wiring (quick tier)."""

import jax

from qwen3_asr_rs_tpu.utils import compile_cache


def test_enable_sets_cache_dir(monkeypatch, tmp_path):
    monkeypatch.setattr(compile_cache, "_done", False)
    monkeypatch.setenv("ASR_COMPILE_CACHE_DIR", str(tmp_path / "xla"))
    assert compile_cache.enable_persistent_compile_cache()
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "xla")
    assert (tmp_path / "xla").is_dir()
    # idempotent: second call is a no-op that still reports enabled
    assert compile_cache.enable_persistent_compile_cache()


def test_opt_out(monkeypatch):
    monkeypatch.setattr(compile_cache, "_done", False)
    monkeypatch.setenv("ASR_COMPILE_CACHE", "0")
    assert not compile_cache.enable_persistent_compile_cache()


def test_put_tree_dedupes_tied_leaves(monkeypatch):
    """Tied embed/lm_head (same array object) must transfer once."""
    import jax
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.weights import loader

    calls = []
    real = jax.device_put

    def counting(x, device=None):
        calls.append(id(x))
        return real(x, device)

    monkeypatch.setattr(jax, "device_put", counting)
    shared = jnp.ones((4, 4))
    tree = {"embed": shared, "lm_head": shared, "other": jnp.zeros(3)}
    out = loader._put_tree(tree, jax.devices()[0])
    assert len(calls) == 2  # shared leaf transferred once
    assert out["embed"] is out["lm_head"]
