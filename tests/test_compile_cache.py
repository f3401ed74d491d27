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
