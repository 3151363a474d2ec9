"""Config-driven CLI tests (the reference's notorch-train UX)."""

import json
import subprocess
import sys

import numpy as np
import pytest

from notorch_tpu.cli.registry import REGISTRY, build, resolve
from notorch_tpu.cli.train import apply_overrides, load_config, run


def test_registry_resolves_core_components():
    for name in ["ChempropBlock", "GraphEmbedding", "MLP", "MSE", "RMSE", "adam", "Gated"]:
        assert resolve(name) is not None
    with pytest.raises(KeyError, match="unknown component"):
        resolve("Nope")


def test_registry_nested_build():
    mod = build(
        {
            "class": "Residual",
            "args": {"module": {"class": "MLP", "args": {"input_dim": 8, "output_size": 8}}},
        }
    )
    assert type(mod).__name__ == "Residual"


def test_overrides():
    cfg = {"trainer": {"epochs": 30}, "model": {"hidden_dim": 256}}
    apply_overrides(cfg, ["trainer.epochs=2", "model.hidden_dim=32", "optimizer.lr=0.001"])
    assert cfg["trainer"]["epochs"] == 2
    assert cfg["model"]["hidden_dim"] == 32
    assert cfg["optimizer"]["lr"] == 0.001


def test_run_prebuilt_config(tmp_path):
    cfg = load_config("configs/dmpnn_regression.yaml")
    apply_overrides(
        cfg,
        [
            "trainer.epochs=2",
            "trainer.batch_size=32",
            "model.hidden_dim=32",
            "model.depth=2",
            f"trainer.checkpoint_dir={tmp_path}/ckpt",
        ],
    )
    # shrink the dataset for test speed
    import pandas as pd

    small = tmp_path / "lipo_small.csv"
    pd.read_csv("tests/data/lipo.csv").head(120).to_csv(small, index=False)
    cfg["data"]["csv"] = str(small)

    out = run(cfg)
    assert len(out["history"]) == 2
    assert np.isfinite(out["history"][-1]["train/loss"])
    assert "test" in out and np.isfinite(out["test"]["val/rmse"])
    # checkpoints written
    assert (tmp_path / "ckpt").exists()


def test_run_declarative_config(tmp_path):
    cfg = load_config("configs/declarative_example.yaml")
    apply_overrides(cfg, ["trainer.epochs=1", "trainer.batch_size=32"])
    import pandas as pd

    small = tmp_path / "lipo_small.csv"
    pd.read_csv("tests/data/lipo.csv").head(80).to_csv(small, index=False)
    cfg["data"]["csv"] = str(small)

    out = run(cfg)
    assert np.isfinite(out["history"][-1]["train/loss"])


def test_predictions_export(tmp_path):
    cfg = load_config("configs/dmpnn_regression.yaml")
    apply_overrides(
        cfg,
        [
            "trainer.epochs=1",
            "trainer.batch_size=32",
            "model.hidden_dim=16",
            "model.depth=1",
            f"trainer.predictions_csv={tmp_path}/preds.csv",
        ],
    )
    import pandas as pd

    small = tmp_path / "lipo_small.csv"
    pd.read_csv("tests/data/lipo.csv").head(100).to_csv(small, index=False)
    cfg["data"]["csv"] = str(small)

    out = run(cfg)
    lines = (tmp_path / "preds.csv").read_text().strip().split("\n")
    assert lines[0] == "pred_0"
    assert len(lines) == 1 + 10  # header + 10% test rows
    float(lines[1])  # parse check


def test_classification_host_metrics(tmp_path, smis):
    """Classification configs report epoch-level host AUROC/AUPRC."""
    import pandas as pd

    rng = np.random.default_rng(0)
    labels = (rng.random(len(smis)) > 0.5).astype(float)  # balanced random
    pd.DataFrame({"smiles": smis, "act": labels}).to_csv(tmp_path / "cls.csv", index=False)
    cfg = {
        "data": {
            "csv": str(tmp_path / "cls.csv"),
            "smiles_col": "smiles",
            "targets": {"y": {"columns": ["act"], "task": "classification"}},
            "split": {"fractions": [0.8, 0.2], "seed": 0},
        },
        "model": {"kind": "dmpnn", "task": "classification", "hidden_dim": 16, "depth": 1},
        "trainer": {"epochs": 1, "batch_size": 32},
    }
    out = run(cfg)
    rec = out["history"][-1]
    assert "val/y_auroc" in rec and "val/y_auprc" in rec
    assert 0.0 <= rec["val/y_auroc"] <= 1.0


def test_run_pretrain_config(tmp_path):
    """kind: pretrain (BASELINE config 5 recipe) trains via the CLI; loss
    falls; checkpoints written; masks re-drawn per epoch."""
    cfg = load_config("configs/pcqm4m_pretrain.yaml")
    apply_overrides(
        cfg,
        [
            "trainer.epochs=6",
            "trainer.batch_size=32",
            "model.hidden_dim=32",
            "model.depth=2",
            "optimizer=null",
            f"trainer.checkpoint_dir={tmp_path}/ckpt",
        ],
    )
    cfg["optimizer"] = {"name": "adam", "lr": 3e-3}
    cfg["data"]["csv"] = "tests/data/smis.csv"
    cfg["data"]["smiles_col"] = "smiles"

    out = run(cfg)
    assert len(out["history"]) == 6
    losses = [h["train/loss"] for h in out["history"]]
    assert np.isfinite(losses[-1]) and losses[-1] < losses[0]
    assert (tmp_path / "ckpt").exists()


def test_run_pretrain_spmd(tmp_path):
    """trainer.spmd: pretraining under shard_map on a data x graph mesh."""
    cfg = load_config("configs/pcqm4m_pretrain.yaml")
    apply_overrides(
        cfg,
        [
            "trainer.epochs=3",
            "trainer.batch_size=16",
            "model.hidden_dim=32",
            "model.depth=2",
            "trainer.checkpoint_dir=null",
        ],
    )
    cfg["optimizer"] = {"name": "adam", "lr": 3e-3}
    cfg["data"]["csv"] = "tests/data/smis.csv"
    cfg["trainer"]["spmd"] = {"data": 4, "graph": 2}

    out = run(cfg)
    losses = [h["train/loss"] for h in out["history"]]
    assert np.isfinite(losses[-1]) and losses[-1] < losses[0]


def _pretrain_cfg(spmd):
    cfg = load_config("configs/pcqm4m_pretrain.yaml")
    apply_overrides(
        cfg,
        [
            "trainer.epochs=2",
            "trainer.batch_size=16",
            "model.hidden_dim=32",
            "model.depth=2",
            "trainer.checkpoint_dir=null",
        ],
    )
    cfg["optimizer"] = {"name": "adam", "lr": 3e-3}
    cfg["data"]["csv"] = "tests/data/smis.csv"
    cfg["trainer"]["spmd"] = spmd
    return cfg


def test_run_pretrain_spmd_parity():
    """The graph-sharded CLI recipe computes the SAME model as the unsharded
    run: identical batch composition/masking order at {data:1, graph:1} vs
    {data:1, graph:2}, so the per-epoch losses and the trained parameters
    must agree (molecule partitioning is zero-boundary; only the masked-CE
    numerator/denominator cross shards). This is the regression gate for the
    round-2 bug where edge-sharded batches were fed to a molecule-partition
    model — losses diverged by 20% and nothing errored."""
    import jax

    out_ref = run(_pretrain_cfg({"data": 1, "graph": 1}))
    out_sh = run(_pretrain_cfg({"data": 1, "graph": 2}))

    l_ref = [h["train/loss"] for h in out_ref["history"]]
    l_sh = [h["train/loss"] for h in out_sh["history"]]
    np.testing.assert_allclose(l_sh, l_ref, rtol=1e-4, atol=1e-6)

    p_ref = jax.tree.leaves(out_ref["_state"].params)
    p_sh = jax.tree.leaves(out_sh["_state"].params)
    for a, b in zip(p_ref, p_sh):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-5)


def test_predict_from_checkpoint(tmp_path):
    """Standalone serving path: train with a checkpoint_dir, then rebuild the
    model + task transforms from predict_meta.json in a fresh entry point and
    produce row-aligned denormalized predictions."""
    import pandas as pd

    from notorch_tpu.cli.predict import run_predict

    cfg = load_config("configs/dmpnn_regression.yaml")
    apply_overrides(
        cfg,
        [
            "trainer.epochs=1",
            "trainer.batch_size=32",
            "model.hidden_dim=16",
            "model.depth=1",
            f"trainer.checkpoint_dir={tmp_path}/ckpt",
        ],
    )
    small = tmp_path / "lipo_small.csv"
    df = pd.read_csv("tests/data/lipo.csv").head(100)
    df.to_csv(small, index=False)
    cfg["data"]["csv"] = str(small)
    run(cfg)
    assert (tmp_path / "ckpt" / "predict_meta.json").exists()

    out_csv = tmp_path / "preds.csv"
    res = run_predict(tmp_path / "ckpt", small, out=out_csv, batch_size=32)
    # named by the training target column, aligned row-for-row with the input
    assert list(res) == ["lipo"]
    assert res["lipo"].shape == (100,)
    assert np.all(np.isfinite(res["lipo"]))
    # denormalized to data units: after 1 epoch the spread should be well off
    # the normalized unit scale of raw heads near zero
    assert abs(float(np.mean(res["lipo"]))) < 50

    lines = out_csv.read_text().strip().split("\n")
    assert lines[0] == "lipo" and len(lines) == 101

    # restoring again is deterministic
    res2 = run_predict(tmp_path / "ckpt", small, batch_size=32)
    np.testing.assert_array_equal(res["lipo"], res2["lipo"])


def test_task_transform_serialization_roundtrip():
    from notorch_tpu.tasks import transforms as tt

    x = np.linspace(-2, 2, 12, dtype=np.float32).reshape(6, 2)
    for t in [
        tt.Normalize((0.5, -1.0), (2.0, 3.0)),
        tt.InverseNormalize((0.5, -1.0), (2.0, 3.0)),
        tt.Sigmoid(),
        tt.Softmax(),
        tt.Dirichlet(),
    ]:
        t2 = tt.deserialize(tt.serialize(t))
        np.testing.assert_allclose(np.asarray(t(x)), np.asarray(t2(x)), rtol=1e-6)
    assert tt.deserialize(tt.serialize(None)) is None
    mve = tt.deserialize(tt.serialize(tt.MVE((1.0,), (2.0,))))
    y = np.ones((4, 1, 2), dtype=np.float32)
    np.testing.assert_allclose(np.asarray(mve(y))[..., 0], 3.0)


def test_run_moe_config(tmp_path):
    """MoE head trains end-to-end from the declarative config: tuple outputs
    (preds, aux) wired through out_keys, router aux loss as a weighted
    SelfSupervisedLoss term."""
    import pandas as pd

    cfg = load_config("configs/moe_regression.yaml")
    apply_overrides(
        cfg,
        ["trainer.epochs=2", "trainer.batch_size=32",
         "model.modules.embed.args.hidden_dim=32",
         "model.modules.mp.args.hidden_dim=32",
         "model.modules.mp.args.depth=1",
         "model.modules.ffn.args.input_dim=32",
         "model.modules.ffn.args.hidden_dim=32",
         "model.modules.ffn.args.num_experts=3"],
    )
    small = tmp_path / "lipo_small.csv"
    pd.read_csv("tests/data/lipo.csv").head(100).to_csv(small, index=False)
    cfg["data"]["csv"] = str(small)
    out = run(cfg)
    rec = out["history"][-1]
    assert np.isfinite(rec["train/loss"])
    assert np.isfinite(rec["train/aux"])  # router balance loss is live
    assert np.isfinite(out["test"]["val/rmse"])


def test_predict_from_checkpoint_dense_layout(tmp_path):
    """Serving path round-trips the dense (MXU per-molecule) layout too."""
    import pandas as pd

    from notorch_tpu.cli.predict import run_predict

    cfg = load_config("configs/dmpnn_regression.yaml")
    apply_overrides(
        cfg,
        ["trainer.epochs=1", "trainer.batch_size=16", "model.hidden_dim=16",
         "model.depth=1", "model.layout=dense",
         f"trainer.checkpoint_dir={tmp_path}/ckpt"],
    )
    small = tmp_path / "lipo_small.csv"
    pd.read_csv("tests/data/lipo.csv").head(48).to_csv(small, index=False)
    cfg["data"]["csv"] = str(small)
    run(cfg)
    res = run_predict(tmp_path / "ckpt", small, batch_size=16)
    assert res["lipo"].shape == (48,) and np.all(np.isfinite(res["lipo"]))


def test_predict_from_checkpoint_mve_head(tmp_path):
    """MVE task: predict meta serializes the MVE denormalizer; output falls
    back to positional names for the 2-channel (mean, var) head."""
    import pandas as pd

    from notorch_tpu.cli.predict import run_predict

    cfg = load_config("configs/dmpnn_regression.yaml")
    apply_overrides(
        cfg,
        ["trainer.epochs=1", "trainer.batch_size=16", "model.hidden_dim=16",
         "model.depth=1", "model.task=mve",
         f"trainer.checkpoint_dir={tmp_path}/ckpt"],
    )
    cfg["data"]["targets"]["y"]["task"] = "mve"
    small = tmp_path / "lipo_small.csv"
    pd.read_csv("tests/data/lipo.csv").head(48).to_csv(small, index=False)
    cfg["data"]["csv"] = str(small)
    run(cfg)
    res = run_predict(tmp_path / "ckpt", small, batch_size=16)
    assert set(res) == {"pred_0", "pred_1"}  # mean, var channels
    assert np.all(np.isfinite(res["pred_0"]))
    assert np.all(res["pred_1"] >= 0)  # variances denormalized by scale^2


def test_run_packed_layout_train_and_predict(tmp_path):
    """layout=dense_packed flows through the CLI end to end: the loader
    bin-packs, the model reads out per molecule, predictions export
    row-aligned, and a fresh predict entry point restores the layout."""
    import pandas as pd

    from notorch_tpu.cli.predict import run_predict

    cfg = load_config("configs/dmpnn_regression.yaml")
    apply_overrides(
        cfg,
        [
            "trainer.epochs=2",
            "trainer.batch_size=32",
            "model.hidden_dim=32",
            "model.depth=2",
            "model.layout=dense_packed",
            f"trainer.checkpoint_dir={tmp_path}/ckpt",
            f"trainer.predictions_csv={tmp_path}/preds.csv",
        ],
    )
    small = tmp_path / "lipo_small.csv"
    pd.read_csv("tests/data/lipo.csv").head(120).to_csv(small, index=False)
    cfg["data"]["csv"] = str(small)

    out = run(cfg)
    assert np.isfinite(out["history"][-1]["train/loss"])
    assert np.isfinite(out["test"]["val/rmse"])
    lines = (tmp_path / "preds.csv").read_text().strip().split("\n")
    assert len(lines) == 1 + 12  # header + 10% test rows

    meta = json.loads((tmp_path / "ckpt" / "predict_meta.json").read_text())
    assert meta["model"]["layout"] == "dense_packed"
    res = run_predict(tmp_path / "ckpt", small, out=tmp_path / "p2.csv", batch_size=32)
    p2 = pd.read_csv(tmp_path / "p2.csv")
    assert len(p2) == 120 and np.isfinite(p2.iloc[:, -1]).all()
