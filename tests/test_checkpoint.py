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


class _Preempt(BaseException):
    pass


class _KillerLoader:
    """Raises (simulated preemption) after yielding N batches total."""

    def __init__(self, loader, kill_after: int):
        self.loader = loader
        self.kill_after = kill_after
        self._yielded = 0

    def set_epoch(self, epoch):
        self.loader.set_epoch(epoch)

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        for b in self.loader:
            if self._yielded >= self.kill_after:
                raise _Preempt()
            self._yielded += 1
            yield b


def _lipo_pieces(n=48, dropout=0.1):
    import pandas as pd

    from notorch_tpu.data.batching import DataLoader
    from notorch_tpu.data.dataset import MolecularDataset, TargetSpec, TransformManager
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    df = pd.read_csv("tests/data/lipo.csv").head(n)
    ds = MolecularDataset(
        df,
        transforms={
            "g": TransformManager(Pipeline(SmiToMol(), MolToGraph()), in_key="smiles")
        },
        targets={"y": TargetSpec(columns=["lipo"], task="regression")},
    )

    def loader():
        return DataLoader(ds, batch_size=8, shuffle=True, seed=3, layout="flat")

    def model():
        return build_dmpnn(hidden_dim=16, depth=2, dropout=dropout, layout="flat")

    return loader, model


def test_preemption_resume_trajectory_equality(tmp_path):
    """Kill a shuffled, dropout-active training run mid-epoch; resume from
    the latest mid-epoch checkpoint; the final parameters equal an
    uninterrupted run EXACTLY (params, opt state, RNG, and the loader
    cursor all restore — the round-3 verdict's missing §5 row)."""
    from notorch_tpu.training.loop import fit

    make_loader, make_model = _lipo_pieces()
    epochs = 3

    # --- uninterrupted reference run -------------------------------------
    model = make_model()
    loader = make_loader()
    state0 = model.init(jax.random.PRNGKey(0), next(iter(loader)))
    ref = fit(model, state0, make_loader(), epochs=epochs)

    # --- interrupted run: die mid-epoch-1, then resume -------------------
    model2 = make_model()
    loader2 = make_loader()
    state2 = model2.init(jax.random.PRNGKey(0), next(iter(loader2)))
    ckpt = Checkpointer(tmp_path / "ckpt", max_to_keep=3)
    killer = _KillerLoader(make_loader(), kill_after=6 + 3)  # dies in epoch 1
    try:
        fit(model2, state2, killer, epochs=epochs, checkpointer=ckpt, checkpoint_every=1)
        raise AssertionError("killer loader did not preempt")
    except _Preempt:
        pass
    assert ckpt.latest_step() is not None

    # resume: FRESH process equivalent — new init (overwritten by restore)
    state3 = model2.init(jax.random.PRNGKey(7), next(iter(make_loader())))
    res = fit(
        model2, state3, make_loader(), epochs=epochs,
        checkpointer=ckpt, resume=True, checkpoint_every=1,
    )

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(ref.state.params),
        jax.device_get(res.state.params),
    )
    assert int(res.state.step) == int(ref.state.step)
    # opt state too: the trajectory is bit-identical, not just the params
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(ref.state.opt_state),
        jax.device_get(res.state.opt_state),
    )


def test_resume_after_completion_is_noop(tmp_path):
    """resume=True on a finished run trains zero additional steps."""
    from notorch_tpu.training.loop import fit

    make_loader, make_model = _lipo_pieces(n=16, dropout=0.0)
    model = make_model()
    loader = make_loader()
    state = model.init(jax.random.PRNGKey(0), next(iter(loader)))
    ckpt = Checkpointer(tmp_path / "ckpt")
    res1 = fit(model, state, make_loader(), epochs=2, checkpointer=ckpt)
    res2 = fit(
        model, model.init(jax.random.PRNGKey(9), next(iter(make_loader()))),
        make_loader(), epochs=2, checkpointer=ckpt, resume=True,
    )
    assert res2.history == []  # no epochs re-run
    assert int(res2.state.step) == int(res1.state.step)


def test_same_step_save_wins(tmp_path):
    """orbax silently skips a save whose step equals the latest checkpoint;
    Checkpointer must delete-and-rewrite so the LATER save (epoch metrics +
    advanced cursor) wins — fit's epoch-end save lands on the same
    state.step as the last checkpoint_every save whenever checkpoint_every
    divides the epoch."""
    model = build_dmpnn(hidden_dim=16, depth=1, layout="flat")
    batch = _batch()
    state = model.init(jax.random.PRNGKey(0), batch)
    ckpt = Checkpointer(tmp_path / "ck")
    ckpt.save(state, step=5, extra={"epoch": 0, "batches_done": 3})
    state2, _ = model.train_step(state, batch)
    ckpt.save(state2, step=5, metrics={"train/loss": 1.0},
              extra={"epoch": 1, "batches_done": 0})
    restored, extra = ckpt.restore(model.init(jax.random.PRNGKey(1), batch),
                                   with_extra=True)
    assert extra == {"epoch": 1, "batches_done": 0}
    # the LATER state was stored (step advanced by the train_step)
    assert int(restored.step) == int(state2.step)


def test_resume_cursor_overrun_raises(tmp_path):
    """A cursor beyond the epoch's batch count (dataset shrank / batch size
    changed) must raise, not silently skip the epoch."""
    import pytest

    from notorch_tpu.training.loop import fit

    make_loader, make_model = _lipo_pieces(n=16, dropout=0.0)
    model = make_model()
    loader = make_loader()
    state = model.init(jax.random.PRNGKey(0), next(iter(loader)))
    ckpt = Checkpointer(tmp_path / "ck")
    # forge a cursor that exceeds the 2-batch epoch
    ckpt.save(state, step=0, extra={"epoch": 0, "batches_done": 99})
    with pytest.raises(RuntimeError, match="exceeds"):
        fit(model, state, make_loader(), epochs=1, checkpointer=ckpt, resume=True)
