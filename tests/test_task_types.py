"""All six task types end to end: train a few steps, predict, check the
output transform semantics (reference TaskType literal, types.py:11)."""

import jax
import numpy as np
import optax
import pytest

from notorch_tpu.data.batching import DataLoader
from notorch_tpu.data.dataset import MolecularDataset, TargetSpec, TransformManager
from notorch_tpu.models.dmpnn import build_dmpnn
from notorch_tpu.training.loop import fit, predict
from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

SMIS = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "CCCC", "c1ccncc1", "CCS", "OCCO"]


def _ds(task, targets):
    return MolecularDataset(
        {"smiles": SMIS, **targets},
        transforms={
            "g": TransformManager(Pipeline(SmiToMol(), MolToGraph()), in_key="smiles")
        },
        targets={"y": TargetSpec(columns=list(targets), task=task)},
    )


def _run(task, targets, **model_kw):
    ds = _ds(task, targets)
    transforms = ds.build_task_transform_configs()
    transforms["y"]["preds"]["key"] = "ffn.preds"
    model = build_dmpnn(
        task=task, transforms=transforms, hidden_dim=16, depth=1,
        optimizer=optax.adam(1e-3), layout="flat", **model_kw,
    )
    loader = DataLoader(ds, batch_size=8)
    state = model.init(jax.random.PRNGKey(0), next(iter(loader)))
    result = fit(model, state, loader, epochs=3)
    assert np.isfinite(result.history[-1]["train/loss"])
    preds = predict(model, result.state.params, loader, keys=["ffn.preds"])
    return preds["ffn.preds"]


def test_regression_task(rng):
    out = _run("regression", {"a": rng.normal(size=8)})
    assert out.shape == (8, 1)


def test_classification_task(rng):
    out = _run("classification", {"a": (rng.random(8) > 0.5).astype(float)})
    assert ((out >= 0) & (out <= 1)).all()  # sigmoid applied at predict


def test_multiclass_task(rng):
    out = _run(
        "multiclass", {"a": rng.integers(0, 3, size=8).astype(float)}, num_classes=3
    )
    np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-5)  # softmax


def test_mve_task(rng):
    out = _run("mve", {"a": rng.normal(size=8)})
    assert out.shape == (8, 1, 2)
    # denormalized variance must be nonnegative... variance channel can be
    # any real pre-transform; MVE transform scales by std^2 only
    assert np.isfinite(out).all()


def test_evidential_task(rng):
    out = _run("evidential", {"a": rng.normal(size=8)})
    assert out.shape == (8, 1, 4)
    var, alpha, beta = out[..., 1], out[..., 2], out[..., 3]
    assert (var >= 0).all()  # softplus
    assert (alpha >= 1).all()  # softplus + 1
    assert (beta >= 0).all()


def test_dirichlet_task(rng):
    out = _run(
        "dirichlet", {"a": rng.integers(0, 2, size=8).astype(float)}, num_classes=2
    )
    assert out.shape == (8, 1, 3)  # k probs + uncertainty channel
    probs, unc = out[..., :2], out[..., 2]
    np.testing.assert_allclose(probs.sum(-1) + 0, probs.sum(-1))  # finite
    assert ((probs >= 0) & (probs <= 1)).all()
    assert ((unc > 0) & (unc <= 1)).all()


def test_loss_weighting():
    """Weighted multi-loss composition (reference train_loss_weights)."""
    import jax.numpy as jnp

    from notorch_tpu.model.model import Model
    from notorch_tpu.nn.embed import GraphEmbedding
    from notorch_tpu.nn.chemprop import ChempropBlock
    from notorch_tpu.nn.agg import Mean
    from notorch_tpu.nn.mlp import MLP
    from notorch_tpu.tasks.losses import MAE, MSE
    from notorch_tpu.data.graph import pad_graphs

    pipe = Pipeline(SmiToMol(), MolToGraph())
    bg = pad_graphs([pipe(s) for s in SMIS[:4]], 64, 128, graph_cap=4)
    y = np.ones((4, 1), np.float32)
    batch = {"inputs.G": bg, "targets.y": y, "targets.y_mask": np.ones_like(y, bool)}

    in_keys = {"preds": "ffn.preds", "targets": "targets.y", "mask": "targets.y_mask"}
    model = Model(
        modules={
            "embed": {"module": GraphEmbedding(hidden_dim=8), "in_keys": ["inputs.G"], "out_keys": ["G"]},
            "mp": {"module": ChempropBlock(hidden_dim=8, depth=1), "in_keys": ["embed.G"], "out_keys": ["G"]},
            "readout": {"module": Mean(), "in_keys": ["mp.G"], "out_keys": ["H"]},
            "ffn": {"module": MLP(8, 1), "in_keys": ["readout.H"], "out_keys": ["preds"]},
        },
        losses={
            "mse": {"fn": MSE(), "in_keys": in_keys, "weight": 1.0},
            "mae": {"fn": MAE(), "in_keys": in_keys, "weight": 1.0},
        },
        train_loss_weights={"mse": 2.0, "mae": 0.5},
    )
    state = model.init(jax.random.PRNGKey(0), batch)
    state, logs = model.train_step(state, batch)
    expected = 2.0 * float(logs["train/mse"]) + 0.5 * float(logs["train/mae"])
    np.testing.assert_allclose(float(logs["train/loss"]), expected, rtol=1e-5)


def test_masked_reduce_weighted_mean():
    """Pins the weighted-MEAN semantics of masked_reduce: sample weights
    appear in the normalizer (true weighted mean), with and without a mask —
    unlike the reference's _reduce (loss.py:51-60), which normalizes by the
    element count so weights rescale rather than reweight."""
    import jax.numpy as jnp

    from notorch_tpu.tasks.losses import masked_reduce

    loss = jnp.asarray([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    w = jnp.asarray([1.0, 2.0, 0.0])
    mask = jnp.asarray([[1, 1], [1, 0], [1, 1]], bool)

    # unweighted, unmasked: plain mean
    np.testing.assert_allclose(float(masked_reduce(loss)), 3.5)
    # mask only: mean over unmasked elements (unchanged semantics)
    np.testing.assert_allclose(
        float(masked_reduce(loss, mask=mask)), (1 + 2 + 3 + 5 + 6) / 5
    )
    # weights only: weighted mean — zero-weight samples drop out entirely
    np.testing.assert_allclose(
        float(masked_reduce(loss, sample_weights=w)),
        (1 * 1 + 1 * 2 + 2 * 3 + 2 * 4) / (2 * 1 + 2 * 2),
    )
    # both: normalizer is sum(w * mask)
    np.testing.assert_allclose(
        float(masked_reduce(loss, mask=mask, sample_weights=w)),
        (1 * 1 + 1 * 2 + 2 * 3) / (1 + 1 + 2),
    )
    # all-masked: defined (0), not NaN
    np.testing.assert_allclose(
        float(masked_reduce(loss, mask=jnp.zeros_like(mask))), 0.0
    )


def test_eval_recombination_with_sample_weights():
    """Per-batch weighted means recombine into the true global weighted mean:
    evaluate() weights each batch by the NORMALIZER masked_reduce used
    (sum(w*m) when sample_weights are wired), so the reported metric does
    not depend on how samples were batched."""
    import jax.numpy as jnp

    from notorch_tpu.data.graph import pad_graphs
    from notorch_tpu.model.model import Model
    from notorch_tpu.nn.agg import Mean
    from notorch_tpu.nn.chemprop import ChempropBlock
    from notorch_tpu.nn.embed import GraphEmbedding
    from notorch_tpu.nn.mlp import MLP
    from notorch_tpu.tasks.losses import MSE
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    pipe = Pipeline(SmiToMol(), MolToGraph())
    rng = np.random.default_rng(0)

    def batch_of(smis_sub, ys, ws):
        gs = [pipe(s) for s in smis_sub]
        bg = pad_graphs(gs, 64, 128, graph_cap=len(gs))
        return {
            "inputs.G": bg,
            "targets.y": np.asarray(ys, np.float32).reshape(-1, 1),
            "targets.y_mask": np.ones((len(gs), 1), bool),
            "targets.w": np.asarray(ws, np.float32),
        }

    in_keys = {
        "preds": "ffn.preds",
        "targets": "targets.y",
        "mask": "targets.y_mask",
        "sample_weights": "targets.w",
    }
    model = Model(
        modules={
            "embed": {"module": GraphEmbedding(hidden_dim=8), "in_keys": ["inputs.G"], "out_keys": ["G"]},
            "mp": {"module": ChempropBlock(hidden_dim=8, depth=1), "in_keys": ["embed.G"], "out_keys": ["G"]},
            "readout": {"module": Mean(), "in_keys": ["mp.G"], "out_keys": ["H"]},
            "ffn": {"module": MLP(8, 1), "in_keys": ["readout.H"], "out_keys": ["preds"]},
        },
        losses={"mse": {"fn": MSE(), "in_keys": in_keys, "weight": 1.0}},
    )
    smis8 = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "CCCC", "c1ccncc1", "CCS", "OCCO"]
    ys = rng.normal(size=8)
    ws = rng.uniform(0.1, 3.0, size=8)
    full = batch_of(smis8, ys, ws)
    state = model.init(jax.random.PRNGKey(0), full)

    # global weighted mean in ONE batch
    logs_full, _ = model.eval_step(state.params, full)
    v_full = float(logs_full["val/loss"])

    # UNEVEN split into two batches, recombined with the _count weights
    b1 = batch_of(smis8[:3], ys[:3], ws[:3])
    b2 = batch_of(smis8[3:], ys[3:], ws[3:])
    num = den = 0.0
    for b in (b1, b2):
        logs, _ = model.eval_step(state.params, b)
        w = float(logs["_count/val/loss"])
        num += float(logs["val/loss"]) * w
        den += w
    np.testing.assert_allclose(num / den, v_full, rtol=1e-5)
