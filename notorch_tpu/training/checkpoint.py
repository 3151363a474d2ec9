"""Checkpoint save/restore for train state.

The reference delegates checkpointing to Lightning (SURVEY §5); here it is a
first-class subsystem: the full :class:`TrainState` pytree (params, optimizer
state, step, RNG key) plus user metadata, written via orbax (async-capable,
multi-host-safe) with retention management.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax


class Checkpointer:
    """Save/restore TrainState pytrees with step-based retention."""

    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, state, step: int, metrics: dict | None = None) -> None:
        import orbax.checkpoint as ocp

        self._mgr.save(
            step,
            args=ocp.args.StandardSave(jax.device_get(state)),
            metrics={k: float(v) for k, v in (metrics or {}).items() if _is_scalar(v)},
        )
        self._mgr.wait_until_finished()

    def restore(self, target, step: int | None = None):
        """Restore into the structure of ``target`` (an example TrainState)."""
        import orbax.checkpoint as ocp

        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(jax.device_get(target)))

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def all_steps(self) -> list[int]:
        return list(self._mgr.all_steps())


def _is_scalar(v: Any) -> bool:
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False
