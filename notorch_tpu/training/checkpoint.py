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


def _is_sharded(tree) -> bool:
    """True when any leaf is a jax.Array laid out across >1 device — the
    multi-chip TrainStates the SPMD trainers produce (replicated params,
    sharded opt-state shards, etc.)."""
    for leaf in jax.tree.leaves(tree):
        if isinstance(leaf, jax.Array) and len(leaf.sharding.device_set) > 1:
            return True
    return False


def _abstract_with_shardings(tree):
    """ShapeDtypeStruct skeleton carrying each leaf's sharding, so orbax
    restores arrays ALREADY laid out on the mesh (no host gather, no
    re-placement step — the multi-host-safe restore path)."""
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        if isinstance(x, jax.Array)
        else x,
        tree,
    )


class Checkpointer:
    """Save/restore TrainState pytrees with step-based retention.

    ``extra`` (a small JSON-able dict — the training loop's epoch/batch
    cursor) rides next to each orbax step directory as ``loop_<step>.json``,
    so the checkpoint format stays plain ``StandardSave`` (old checkpoints
    restore unchanged) while ``fit(resume=True)`` can recover its position.
    Sidecars follow the same retention as the step dirs.

    Sharded states (SPMD trainers — any leaf spanning >1 device) are
    detected automatically: they are handed to orbax AS jax.Arrays (each
    host writes its shards; no device_get gather) and restored against a
    sharding-annotated abstract target so the arrays come back already laid
    out on the mesh. Single-process states keep the plain numpy round-trip.

    ``best_by``/``best_mode`` switch retention from latest-K to BEST-K by a
    logged metric (e.g. ``best_by="val/rmse", best_mode="min"``); the
    metric must appear in the ``metrics`` dict passed to :meth:`save` (fit's
    epoch-end saves pass the epoch record). :meth:`best_step` /
    ``restore(step=ckpt.best_step())`` then recover the best checkpoint —
    the reference gets this from Lightning's ``ModelCheckpoint(monitor=...)``
    (``notorch/cli/utils/instantiate.py:9-43``)."""

    def __init__(
        self,
        directory: str | Path,
        max_to_keep: int = 3,
        best_by: str | None = None,
        best_mode: str = "min",
    ):
        import orbax.checkpoint as ocp

        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.best_by = best_by
        if best_mode not in ("min", "max"):
            raise ValueError(f"best_mode must be 'min' or 'max', got {best_mode!r}")
        kwargs: dict = {}
        if best_by is not None:
            kwargs["best_fn"] = lambda metrics: (metrics or {}).get(
                best_by, float("inf") if best_mode == "min" else float("-inf")
            )
            kwargs["best_mode"] = best_mode
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, **kwargs
            ),
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
        payload = state if _is_sharded(state) else jax.device_get(state)
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(payload),
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
        Sharded targets restore onto their mesh layout directly.
        ``with_extra=True`` returns ``(state, extra_dict_or_None)``."""
        import orbax.checkpoint as ocp

        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if _is_sharded(target):
            restore_target = _abstract_with_shardings(target)
        else:
            restore_target = jax.device_get(target)
        state = self._mgr.restore(step, args=ocp.args.StandardRestore(restore_target))
        if not with_extra:
            return state
        sidecar = self.directory / f"loop_{step}.json"
        extra = json.loads(sidecar.read_text()) if sidecar.exists() else None
        return state, extra

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def best_step(self) -> int | None:
        """The step whose saved metrics optimize ``best_by`` (None when no
        checkpoint has the metric or best-tracking is off)."""
        return self._mgr.best_step() if self.best_by is not None else None

    def all_steps(self) -> list[int]:
        return list(self._mgr.all_steps())


def _is_scalar(v: Any) -> bool:
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False
