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


class AsyncTrainCheckpointer:
    """Non-blocking checkpoint writes for long training runs.

    ``save()`` hands the state to orbax's background writer and returns
    immediately, so the next train steps overlap with serialization
    (device arrays are snapshotted before the call returns — later
    donation/mutation cannot corrupt the write). ``wait()`` joins all
    outstanding writes; call it before reading files back or exiting.
    Keeps the newest ``max_to_keep`` step directories.
    """

    def __init__(self, root: str | Path, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self.root = Path(root).absolute()
        self.root.mkdir(parents=True, exist_ok=True)
        self.max_to_keep = max_to_keep
        self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())

    def step_path(self, step: int) -> Path:
        return self.root / f"step_{step:08d}"

    def save(self, state: TrainState) -> Path:
        step = int(state.step)
        path = self.step_path(step)
        self._ckptr.save(
            path,
            {
                "params": state.params,
                "opt_state": state.opt_state,
                "step": state.step,
            },
            force=True,
        )
        logger.info("Async checkpoint started for step %d at %s", step, path)
        self._gc()
        return path

    def _gc(self) -> None:
        steps = sorted(self.root.glob("step_*"))
        if len(steps) <= self.max_to_keep:
            return
        import shutil

        # join outstanding writes first: never delete under a writer
        self._ckptr.wait_until_finished()
        for old in steps[: -self.max_to_keep]:
            shutil.rmtree(old, ignore_errors=True)
            logger.info("Pruned old checkpoint %s", old)

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def latest(self) -> Path | None:
        self.wait()
        steps = sorted(self.root.glob("step_*"))
        return steps[-1] if steps else None

    def restore_latest(self, template: TrainState) -> TrainState:
        path = self.latest()
        if path is None:
            raise FileNotFoundError(f"no checkpoints under {self.root}")
        return restore_train_state(path, template)

    def close(self) -> None:
        self.wait()
        self._ckptr.close()


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
