"""Persistent XLA compilation cache for fast process restarts.

The reference is an ahead-of-time-compiled binary with zero per-run
warm-up (src/main.rs:7-81); a jit-based runtime instead pays a fresh
XLA compile of every bucket graph on each process start (~30-60 s on a
local chip). Enabling JAX's persistent compilation cache amortises that
across runs: compiled executables are keyed by (HLO, compile options,
backend) and reloaded from disk, so the second `asr ...` invocation and
every server restart skip straight to execution.

Knobs:
  ASR_COMPILE_CACHE       "0"/"off" disables (default: enabled)
  ASR_COMPILE_CACHE_DIR   cache directory
                          (default ~/.cache/qwen3_asr_rs_tpu/xla)
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_done = False


def enable_persistent_compile_cache() -> bool:
    """Idempotently point JAX's compilation cache at a persistent dir.

    Returns True when the cache is (already) enabled. Safe to call
    before or after the backend is initialised; failures (read-only
    home, ancient jax) degrade to cold compiles with a debug log.
    """
    global _done
    if os.environ.get("ASR_COMPILE_CACHE", "1").lower() in (
        "0", "off", "false", "no",
    ):
        return False
    if _done:
        return True
    import jax

    path = os.environ.get("ASR_COMPILE_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "qwen3_asr_rs_tpu", "xla"
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache everything that took >=1 s to compile: bucket graphs are
        # tens of seconds, while the tiny host-side helper jits stay out
        # of the cache (they recompile faster than a disk read).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # noqa: BLE001 — optional fast path only
        logger.debug("persistent compile cache unavailable: %s", e)
        return False
    _done = True
    logger.debug("persistent compile cache at %s", path)
    return True
