"""Checkpoint save/restore for train state.

The reference delegates checkpointing to Lightning (SURVEY §5); here it is a
first-class subsystem: the full :class:`TrainState` pytree (params, optimizer
state, step, RNG key) plus user metadata, written via orbax (async-capable,
multi-host-safe) with retention management.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax


class Checkpointer:
    """Save/restore TrainState pytrees with step-based retention.

    ``extra`` (a small JSON-able dict — the training loop's epoch/batch
    cursor) rides next to each orbax step directory as ``loop_<step>.json``,
    so the checkpoint format stays plain ``StandardSave`` (old checkpoints
    restore unchanged) while ``fit(resume=True)`` can recover its position.
    Sidecars follow the same retention as the step dirs."""

    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(
        self, state, step: int, metrics: dict | None = None, extra: dict | None = None
    ) -> None:
        import orbax.checkpoint as ocp

        if self._mgr.latest_step() == step:
            # orbax silently SKIPS a save whose step equals the latest
            # checkpoint (fit's epoch-end save lands on the same state.step
            # as the last checkpoint_every save whenever checkpoint_every
            # divides the epoch) — delete first so the later save, which
            # carries the epoch metrics and the advanced cursor, wins
            self._mgr.delete(step)
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(jax.device_get(state)),
            metrics={k: float(v) for k, v in (metrics or {}).items() if _is_scalar(v)},
        )
        self._mgr.wait_until_finished()
        if extra is not None:
            (self.directory / f"loop_{step}.json").write_text(json.dumps(extra))
        kept = set(self.all_steps())
        for p in self.directory.glob("loop_*.json"):
            try:
                s = int(p.stem.split("_", 1)[1])
            except ValueError:
                continue
            if s not in kept:
                p.unlink(missing_ok=True)

    def restore(self, target, step: int | None = None, with_extra: bool = False):
        """Restore into the structure of ``target`` (an example TrainState).
        ``with_extra=True`` returns ``(state, extra_dict_or_None)``."""
        import orbax.checkpoint as ocp

        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        state = self._mgr.restore(
            step, args=ocp.args.StandardRestore(jax.device_get(target))
        )
        if not with_extra:
            return state
        sidecar = self.directory / f"loop_{step}.json"
        extra = json.loads(sidecar.read_text()) if sidecar.exists() else None
        return state, extra

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
