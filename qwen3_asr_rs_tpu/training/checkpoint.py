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

    def __init__(self, root: str | Path, max_to_keep: int = 3,
                 keep_best: int = 0, best_mode: str = "min"):
        import json

        import orbax.checkpoint as ocp

        self.root = Path(root).absolute()
        self.root.mkdir(parents=True, exist_ok=True)
        self.max_to_keep = max_to_keep
        # best-k retention: checkpoints whose metric ranks in the top
        # ``keep_best`` (per ``best_mode``: "min" for losses, "max" for
        # accuracies) are never pruned; the metric journal persists in
        # metrics.json so resumes keep the ranking.
        if best_mode not in ("min", "max"):
            raise ValueError(f"best_mode must be min or max, got {best_mode}")
        self.keep_best = keep_best
        self.best_mode = best_mode
        self._metrics_path = self.root / "metrics.json"
        self._metrics: dict[str, float] = {}
        if self._metrics_path.exists():
            try:
                self._metrics = json.loads(self._metrics_path.read_text())
            except ValueError:
                # a crash mid-write left truncated JSON; the journal is
                # an optimization, not ground truth — rebuild empty
                logger.warning(
                    "corrupt %s; best-K ranking resets", self._metrics_path
                )
        self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        # SAVE-ORDER list for recency-based pruning: "newest" means most
        # recently written, NOT numerically highest — after a rollback
        # (restore an earlier step and resume) the fresh low-numbered
        # checkpoints are the ones to keep. Seeded from disk in numeric
        # order (the best available proxy across sessions).
        self._save_order: list[int] = [
            int(p.name.split("_")[1]) for p in self._step_dirs()
        ]
        # drop journal ghosts for checkpoints that no longer exist (they
        # would waste best-K protection slots on deleted dirs)
        on_disk = set(self._save_order)
        stale = [k for k in self._metrics if int(k) not in on_disk]
        for k in stale:
            del self._metrics[k]
        if stale:
            self._write_metrics()
        # the most recent async dispatch, possibly still writing; _gc
        # only joins the writer when a prune victim is this path
        self._last_dispatched: Path | None = None

    def step_path(self, step: int) -> Path:
        return self.root / f"step_{step:08d}"

    def _step_dirs(self) -> list[Path]:
        """Finalized step directories (excludes orbax tmp dirs)."""
        import re as _re

        return sorted(
            p for p in self.root.glob("step_*")
            if _re.fullmatch(r"step_\d{8,}", p.name)
        )

    def save(self, state: TrainState, metric: float | None = None) -> Path:
        import json

        step = int(state.step)
        path = self.step_path(step)
        if step in self._save_order:
            self._save_order.remove(step)
        self._save_order.append(step)
        if metric is not None:
            self._metrics[str(step)] = float(metric)
            self._write_metrics()
        # Prune BEFORE dispatching, so in steady state the victim set
        # never contains the write we are about to start and save()
        # stays non-blocking (the round-2 version gc'd after dispatch
        # and waited on its own write every call past max_to_keep).
        self._gc()
        self._ckptr.save(
            path,
            {
                "params": state.params,
                "opt_state": state.opt_state,
                "step": state.step,
            },
            force=True,
        )
        self._last_dispatched = path
        logger.info("Async checkpoint started for step %d at %s", step, path)
        return path

    def _write_metrics(self) -> None:
        """Atomic journal write (a crash mid-write must not leave
        truncated JSON that poisons the next session's constructor)."""
        import json
        import os

        tmp = self._metrics_path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(self._metrics))
        os.replace(tmp, self._metrics_path)

    def _ranked_best(self) -> list[int]:
        """Step numbers best-first by the journaled metric."""
        sign = 1.0 if self.best_mode == "min" else -1.0
        return [
            int(k)
            for k, _ in sorted(
                self._metrics.items(), key=lambda kv: sign * kv[1]
            )
        ]

    def _gc(self) -> None:
        steps = self._step_dirs()
        protected = set(self._ranked_best()[: self.keep_best])
        if self.max_to_keep > 0:  # [-0:] would protect EVERYTHING
            protected |= set(self._save_order[-self.max_to_keep :])
        victims = [
            p for p in steps if int(p.name.split("_")[1]) not in protected
        ]
        if not victims:
            return
        import shutil

        # A finalized step_XXXXXXXX dir means orbax's atomic tmp->final
        # rename already happened, so deleting it cannot race the array
        # writes; only the most recent dispatch may still have pending
        # commit work. Join the writer ONLY if that path is a victim
        # (max_to_keep=1 edge case) — otherwise save() stays async.
        if self._last_dispatched is not None and any(
            p == self._last_dispatched for p in victims
        ):
            self._ckptr.wait_until_finished()
            self._last_dispatched = None
        journal_dirty = False
        for old in victims:
            shutil.rmtree(old, ignore_errors=True)
            pruned_step = int(old.name.split("_")[1])
            if self._metrics.pop(str(pruned_step), None) is not None:
                journal_dirty = True
            if pruned_step in self._save_order:
                self._save_order.remove(pruned_step)
            logger.info("Pruned old checkpoint %s", old)
        if journal_dirty:
            # keep the on-disk journal in sync: a stale entry for a
            # deleted checkpoint would count against the next session's
            # best-K protection
            self._write_metrics()

    def best(self) -> Path | None:
        """Path of the best-metric checkpoint still on disk."""
        self.wait()
        for step in self._ranked_best():
            p = self.step_path(step)
            if p.exists():
                return p
        return None

    def restore_best(self, template: TrainState) -> TrainState:
        path = self.best()
        if path is None:
            raise FileNotFoundError(
                f"no metric-journaled checkpoints under {self.root}"
            )
        return restore_train_state(path, template)

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def latest(self) -> Path | None:
        self.wait()
        steps = self._step_dirs()
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
