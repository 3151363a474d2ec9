"""Checkpoint/resume round-trip tests."""

import jax
import numpy as np

from notorch_tpu.models.dmpnn import build_dmpnn
from notorch_tpu.training.checkpoint import Checkpointer

from .test_parallel import PIPE, SMIS


def _batch():
    from notorch_tpu.data.graph import pad_graphs

    graphs = [PIPE(s) for s in SMIS[:4]]
    bg = pad_graphs(graphs, 64, 128, graph_cap=4)
    y = np.random.default_rng(0).normal(size=(4, 1)).astype(np.float32)
    return {"inputs.G": bg, "targets.y": y, "targets.y_mask": np.ones_like(y, dtype=bool)}


def test_checkpoint_roundtrip(tmp_path):
    model = build_dmpnn(hidden_dim=16, depth=2, layout="flat")
    batch = _batch()
    state = model.init(jax.random.PRNGKey(0), batch)
    for _ in range(3):
        state, _ = model.train_step(state, batch)

    ckpt = Checkpointer(tmp_path / "ckpt", max_to_keep=2)
    ckpt.save(state, step=3, metrics={"train/loss": 1.0})

    fresh = model.init(jax.random.PRNGKey(1), batch)
    restored = ckpt.restore(fresh)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(state),
        restored,
    )
    assert int(restored.step) == 3

    # resume training from the restored state
    state2, logs = model.train_step(restored, batch)
    assert int(state2.step) == 4
    assert np.isfinite(float(logs["train/loss"]))


def test_checkpoint_retention(tmp_path):
    model = build_dmpnn(hidden_dim=16, depth=1, layout="flat")
    batch = _batch()
    state = model.init(jax.random.PRNGKey(0), batch)
    ckpt = Checkpointer(tmp_path / "ckpt", max_to_keep=2)
    for step in [1, 2, 3]:
        ckpt.save(state, step=step)
    assert ckpt.latest_step() == 3
    assert len(ckpt.all_steps()) == 2  # retention pruned step 1
