"""Training checkpoint save/resume (orbax).

The reference has no training and is load-only for weights (SURVEY.md §5);
this adds the full checkpoint/resume subsystem for the fine-tuning path:
TrainState (params + optimizer state + step) round-trips through orbax,
and inference-format safetensors can be exported from a TrainState at any
point via weights/export.py for serving.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any

import jax

from .train_step import TrainState

logger = logging.getLogger(__name__)


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(path: str | Path, state: TrainState) -> None:
    path = Path(path).absolute()
    ckpt = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    _checkpointer().save(path, ckpt, force=True)
    logger.info("Saved training checkpoint at step %s to %s",
                int(state.step), path)


def restore_train_state(path: str | Path, template: TrainState) -> TrainState:
    """Restore a TrainState; ``template`` supplies structure/shardings."""
    path = Path(path).absolute()
    tpl = {
        "params": template.params,
        "opt_state": template.opt_state,
        "step": template.step,
    }
    restored = _checkpointer().restore(path, item=tpl)
    logger.info("Restored training checkpoint from %s (step %s)", path,
                int(restored["step"]))
    return TrainState(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
