"""Round-5 training-loop capabilities: early stopping, best-K checkpoint
retention, gradient clipping, and SHARDED checkpoint/resume for the SPMD
trainers — the capabilities the reference inherits from Lightning
(EarlyStopping / ModelCheckpoint(monitor=...) / Trainer(gradient_clip_val) /
DDP checkpointing via ``notorch/cli/train.py:30``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from notorch_tpu.data.batching import DataLoader
from notorch_tpu.data.dataset import MolecularDataset, TargetSpec, TransformManager
from notorch_tpu.models.dmpnn import build_dmpnn
from notorch_tpu.training.checkpoint import Checkpointer
from notorch_tpu.training.loop import fit
from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

from .test_parallel import PIPE, SMIS


def _dataset(n=16, seed=0):
    rng = np.random.default_rng(seed)
    smis = (SMIS * 3)[:n]
    return MolecularDataset(
        {"smiles": smis, "y": list(rng.normal(size=n))},
        transforms={
            "graph": TransformManager(Pipeline(SmiToMol(), MolToGraph()), in_key="smiles")
        },
        targets={"y": TargetSpec(columns=["y"], task="regression")},
    )


# -- early stopping -----------------------------------------------------------


def test_early_stopping_on_plateau():
    """lr=0 -> the val metric never improves -> stop after patience epochs."""
    import optax

    ds = _dataset()
    model = build_dmpnn(hidden_dim=16, depth=1, layout="flat", optimizer=optax.sgd(0.0))
    loader = DataLoader(ds, batch_size=8, layout="flat")
    state = model.init(jax.random.PRNGKey(0), next(iter(loader)))
    res = fit(
        model, state, loader, val_loader=DataLoader(ds, batch_size=8, layout="flat"),
        epochs=50,
        early_stopping={"monitor": "val/mse", "patience": 3, "min_delta": 0.0},
    )
    assert res.stopped_early
    # first epoch sets the best; 3 non-improving epochs follow
    assert len(res.history) == 4


def test_early_stopping_keeps_training_while_improving():
    ds = _dataset()
    model = build_dmpnn(hidden_dim=32, depth=2, layout="flat")
    loader = DataLoader(ds, batch_size=8, layout="flat", shuffle=True, seed=0)
    state = model.init(jax.random.PRNGKey(0), next(iter(loader)))
    res = fit(
        model, state, loader, val_loader=DataLoader(ds, batch_size=8, layout="flat"),
        epochs=5,
        early_stopping={"monitor": "val/mse", "patience": 10},
    )
    assert not res.stopped_early
    assert len(res.history) == 5


def test_early_stopping_missing_monitor_raises():
    ds = _dataset()
    model = build_dmpnn(hidden_dim=16, depth=1, layout="flat")
    loader = DataLoader(ds, batch_size=8, layout="flat")
    state = model.init(jax.random.PRNGKey(0), next(iter(loader)))
    with pytest.raises(KeyError, match="monitor"):
        fit(model, state, loader, epochs=1,
            early_stopping={"monitor": "val/mse", "patience": 1})


# -- best-K checkpointing -----------------------------------------------------


def test_best_by_retention_and_restore(tmp_path):
    """Checkpointer(best_by=...) keeps the best-metric steps and
    best_step() finds the optimum, not the latest."""
    model = build_dmpnn(hidden_dim=16, depth=1, layout="flat")
    graphs = [PIPE(s) for s in SMIS[:4]]
    from notorch_tpu.data.graph import pad_graphs

    bg = pad_graphs(graphs, 64, 128, graph_cap=4)
    y = np.ones((4, 1), np.float32)
    batch = {"inputs.G": bg, "targets.y": y, "targets.y_mask": np.ones_like(y, bool)}
    state = model.init(jax.random.PRNGKey(0), batch)

    ckpt = Checkpointer(tmp_path / "ck", max_to_keep=2, best_by="val/rmse")
    losses = {1: 3.0, 2: 1.0, 3: 2.0, 4: 5.0}
    states = {}
    for step, v in losses.items():
        state, _ = model.train_step(state, batch)
        states[step] = jax.device_get(state)
        ckpt.save(state, step=step, metrics={"val/rmse": v})
    assert ckpt.best_step() == 2
    kept = set(ckpt.all_steps())
    assert 2 in kept and len(kept) == 2  # best retained under max_to_keep=2
    restored = ckpt.restore(state, step=ckpt.best_step())
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        states[2], jax.device_get(restored),
    )


def test_fit_with_best_by_tracks_val_metric(tmp_path):
    """fit() epoch-end saves carry val metrics, so best_by sees them."""
    ds = _dataset()
    model = build_dmpnn(hidden_dim=32, depth=2, layout="flat")
    loader = DataLoader(ds, batch_size=8, layout="flat", shuffle=True, seed=0)
    state = model.init(jax.random.PRNGKey(0), next(iter(loader)))
    ckpt = Checkpointer(tmp_path / "ck", max_to_keep=5, best_by="val/rmse")
    res = fit(
        model, state, loader, val_loader=DataLoader(ds, batch_size=8, layout="flat"),
        epochs=3, checkpointer=ckpt,
    )
    best = ckpt.best_step()
    assert best is not None
    rmses = {int(h["epoch"]): h["val/rmse"] for h in res.history}
    steps_per_epoch = len(loader)
    best_epoch = (best // steps_per_epoch) - 1
    assert rmses[best_epoch] == min(rmses.values())


# -- gradient clipping --------------------------------------------------------


def test_clip_norm_config_bounds_update():
    from notorch_tpu.cli.train import build_optimizer

    opt = build_optimizer({"name": "sgd", "lr": 1.0, "clip_norm": 1e-3})
    params = {"w": jnp.ones((4,)) * 0.5}
    grads = {"w": jnp.ones((4,)) * 100.0}  # global norm 200
    st = opt.init(params)
    updates, _ = opt.update(grads, st, params)
    gn = float(jnp.linalg.norm(updates["w"]))
    np.testing.assert_allclose(gn, 1e-3, rtol=1e-5)  # clipped to the norm cap

    # without clip_norm the update is the raw grad
    opt2 = build_optimizer({"name": "sgd", "lr": 1.0})
    updates2, _ = opt2.update(grads, opt2.init(params), params)
    assert float(jnp.linalg.norm(updates2["w"])) > 100


def test_clip_norm_trains(tmp_path):
    """A clipped run trains end-to-end through the CLI config path."""
    from notorch_tpu.cli.train import run

    import pandas as pd

    small = tmp_path / "lipo_small.csv"
    pd.read_csv("tests/data/lipo.csv").head(24).to_csv(small, index=False)
    cfg = {
        "data": {"csv": str(small), "targets": {"y": {"columns": ["lipo"]}}},
        "model": {"kind": "dmpnn", "hidden_dim": 16, "depth": 1},
        "optimizer": {"name": "adam", "lr": 1e-3, "clip_norm": 0.5},
        "trainer": {"epochs": 1, "batch_size": 8, "prefetch": 0},
    }
    out = run(cfg)
    assert np.isfinite(out["history"][-1]["train/loss"])


# -- sharded checkpoint + SPMD resume ----------------------------------------


def _dense_spmd_pieces(tmp_path=None, n_devices=4):
    from notorch_tpu.parallel.dense_dp import DenseSpmdTrainer
    from notorch_tpu.parallel.mesh import make_mesh

    ds = _dataset(n=16, seed=3)
    model = build_dmpnn(hidden_dim=16, depth=2, layout="dense_packed")
    mesh = make_mesh({"data": n_devices}, devices=jax.devices()[:n_devices])
    trainer = DenseSpmdTrainer(model, mesh)

    def loader():
        return DataLoader(
            ds, batch_size=16, layout="dense_packed", bin_edges=64,
            shards=n_devices, shuffle=True, seed=5,
        )

    return trainer, model, loader


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_sharded_checkpoint_roundtrip(tmp_path):
    """A TrainState living on the mesh saves WITHOUT a host gather and
    restores ALREADY sharded (orbax sharded-array path)."""
    trainer, model, loader = _dense_spmd_pieces()
    batch = next(iter(loader()))
    state = trainer.init(jax.random.PRNGKey(0), batch)
    state, _ = trainer.train_step(state, batch)
    assert any(
        isinstance(x, jax.Array) and len(x.sharding.device_set) > 1
        for x in jax.tree.leaves(state)
    )
    ckpt = Checkpointer(tmp_path / "ck")
    ckpt.save(state, step=1)
    fresh = trainer.init(jax.random.PRNGKey(9), batch)
    restored = ckpt.restore(fresh)
    # values match AND the restored arrays are laid out on the mesh
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(state), jax.device_get(restored),
    )
    leaves = [x for x in jax.tree.leaves(restored) if isinstance(x, jax.Array)]
    assert any(len(x.sharding.device_set) > 1 for x in leaves)
    # restored state trains
    state2, logs = trainer.train_step(restored, batch)
    assert np.isfinite(float(logs["train/loss"]))


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_spmd_preemption_resume_trajectory_equality(tmp_path):
    """The single-chip kill-and-resume guarantee, verbatim, for the
    molecule-sharded DenseSpmdTrainer: resume from a mid-run sharded
    checkpoint reproduces the uninterrupted trajectory EXACTLY."""
    from .test_checkpoint import _KillerLoader, _Preempt

    trainer, model, loader = _dense_spmd_pieces()
    epochs = 3

    state0 = trainer.init(jax.random.PRNGKey(0), next(iter(loader())))
    ref = fit(trainer, state0, loader(), epochs=epochs)

    state1 = trainer.init(jax.random.PRNGKey(0), next(iter(loader())))
    ckpt = Checkpointer(tmp_path / "ck", max_to_keep=3)
    killer = _KillerLoader(loader(), kill_after=1)  # dies in epoch 1 (1 batch/epoch)
    try:
        fit(trainer, state1, killer, epochs=epochs, checkpointer=ckpt,
            checkpoint_every=1)
        raise AssertionError("killer loader did not preempt")
    except _Preempt:
        pass
    assert ckpt.latest_step() is not None

    state2 = trainer.init(jax.random.PRNGKey(7), next(iter(loader())))
    res = fit(trainer, state2, loader(), epochs=epochs, checkpointer=ckpt,
              resume=True, checkpoint_every=1)

    for a, b in zip(
        jax.tree.leaves(jax.device_get(ref.state.params)),
        jax.tree.leaves(jax.device_get(res.state.params)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(res.state.step) == int(ref.state.step)
    for a, b in zip(
        jax.tree.leaves(jax.device_get(ref.state.opt_state)),
        jax.tree.leaves(jax.device_get(res.state.opt_state)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_spmd_fit_resume_flat_edge_partitioned(tmp_path):
    """spmd_fit + ShardedDataLoader (flat layout, edge-partitioned
    SpmdTrainer) checkpoint/resume: the resumed run lands on the same
    params as an uninterrupted one."""
    from notorch_tpu.nn.chemprop import ChempropBlock  # noqa: F401 (layout dep)
    from notorch_tpu.parallel.loader import ShardedDataLoader, spmd_fit
    from notorch_tpu.parallel.mesh import make_mesh
    from notorch_tpu.parallel.spmd import SpmdTrainer

    from .test_checkpoint import _KillerLoader, _Preempt

    ds = _dataset(n=16, seed=4)
    model = build_dmpnn(hidden_dim=16, depth=1, layout="flat")
    mesh = make_mesh({"data": 2}, devices=jax.devices()[:2])
    trainer = SpmdTrainer(model, mesh, data_axis="data")

    def loader():
        return ShardedDataLoader(ds, n_data=2, per_shard_graphs=4, shuffle=True, seed=11)

    state0 = trainer.init(jax.random.PRNGKey(0), next(iter(loader())))
    ref_state, _ = spmd_fit(trainer, state0, loader(), epochs=2)

    state1 = trainer.init(jax.random.PRNGKey(0), next(iter(loader())))
    ckpt = Checkpointer(tmp_path / "ck")
    killer = _KillerLoader(loader(), kill_after=3)
    try:
        spmd_fit(trainer, state1, killer, epochs=2, checkpointer=ckpt,
                 checkpoint_every=1)
        raise AssertionError("killer loader did not preempt")
    except _Preempt:
        pass

    state2 = trainer.init(jax.random.PRNGKey(5), next(iter(loader())))
    res_state, _ = spmd_fit(trainer, state2, loader(), epochs=2, checkpointer=ckpt,
                            resume=True, checkpoint_every=1)
    for a, b in zip(
        jax.tree.leaves(jax.device_get(ref_state.params)),
        jax.tree.leaves(jax.device_get(res_state.params)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_early_stopping_best_by_e2e(tmp_path):
    """The full config surface: early_stopping + best_by + clip_norm through
    run() — stops early on a plateau, reports best_step, and evaluates the
    test split with the BEST epoch's weights."""
    import pandas as pd

    from notorch_tpu.cli.train import run

    small = tmp_path / "lipo_small.csv"
    pd.read_csv("tests/data/lipo.csv").head(48).to_csv(small, index=False)
    cfg = {
        "data": {
            "csv": str(small),
            "targets": {"y": {"columns": ["lipo"]}},
            "split": {"fractions": [0.6, 0.2, 0.2], "seed": 0},
        },
        "model": {"kind": "dmpnn", "hidden_dim": 16, "depth": 1},
        "optimizer": {"name": "sgd", "lr": 0.0, "clip_norm": 1.0},  # plateau
        "trainer": {
            "epochs": 40, "batch_size": 16, "prefetch": 0, "seed": 0,
            "checkpoint_dir": str(tmp_path / "ck"),
            "best_by": "val/rmse",
            "early_stopping": {"monitor": "val/rmse", "patience": 2},
        },
    }
    out = run(cfg)
    assert out["stopped_early"]
    assert len(out["history"]) == 3  # 1 best + 2 plateau epochs
    assert "best_step" in out
    assert np.isfinite(out["test"]["val/rmse"])
