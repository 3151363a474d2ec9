"""Multitask BCE classification gate (the Tox21-style config 2 shape):
12 tasks, missing labels, masked BCE, host-side AUROC over the eval pass."""

import jax
import numpy as np
import optax

from notorch_tpu.chem import parse_smiles
from notorch_tpu.data.batching import DataLoader
from notorch_tpu.data.dataset import MolecularDataset, TargetSpec, TransformManager
from notorch_tpu.models.dmpnn import build_dmpnn
from notorch_tpu.tasks.metrics import AUROC, auprc, auroc, f1_score
from notorch_tpu.training.loop import evaluate, fit
from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol


def _structural_labels(smis, rng):
    """12 binary tasks derivable from structure (so the model can learn
    them), with ~20% randomly-missing labels."""
    rows = []
    for smi in smis:
        m = parse_smiles(smi)
        n_atoms = m.GetNumAtoms()
        syms = [a.GetSymbol() for a in m.atoms]
        arom = sum(a.GetIsAromatic() for a in m.atoms)
        labels = [
            "N" in syms,
            "O" in syms,
            "S" in syms,
            ("Cl" in syms) or ("Br" in syms) or ("F" in syms),
            arom > 0,
            arom >= 6,
            n_atoms > 20,
            n_atoms > 30,
            any(b.bond_type.name == "DOUBLE" for b in m.bonds),
            any(b.bond_type.name == "TRIPLE" for b in m.bonds),
            sum(a.formal_charge != 0 for a in m.atoms) > 0,
            m.GetNumBonds() > n_atoms,  # has rings
        ]
        rows.append([float(x) for x in labels])
    Y = np.asarray(rows, dtype=np.float32)
    missing = rng.random(Y.shape) < 0.2
    Y[missing] = np.nan
    return Y


def test_multitask_bce_auroc(smis, rng):
    Y = _structural_labels(smis, rng)
    cols = [f"t{i}" for i in range(12)]
    df = {"smiles": smis, **{c: Y[:, i] for i, c in enumerate(cols)}}
    ds = MolecularDataset(
        df,
        transforms={
            "graph": TransformManager(Pipeline(SmiToMol(), MolToGraph()), in_key="smiles")
        },
        targets={"y": TargetSpec(columns=cols, task="classification")},
    )

    model = build_dmpnn(
        num_tasks=12,
        task="classification",
        hidden_dim=64,
        depth=2,
        optimizer=optax.adam(2e-3),
        layout="flat",
    )
    loader = DataLoader(ds, batch_size=50, shuffle=True, seed=0)
    state = model.init(jax.random.PRNGKey(0), next(iter(loader)))
    result = fit(model, state, loader, epochs=60)

    host_metrics = {
        "auroc": {
            "fn": AUROC(),
            "in_keys": {"preds": "ffn.preds", "targets": "targets.y", "mask": "targets.y_mask"},
        }
    }
    logs = evaluate(
        model, result.state.params, DataLoader(ds, batch_size=50), host_metrics=host_metrics
    )
    assert logs["val/auroc"] > 0.9, logs  # memorization AUROC on train set


def test_host_metrics_against_known_values():
    preds = np.asarray([0.9, 0.8, 0.7, 0.3, 0.2, 0.1])
    targets = np.asarray([1, 1, 0, 1, 0, 0], dtype=float)
    # perfect separation would be 1.0; one inversion pair (0.7 vs 0.3)
    a = auroc(preds, targets)
    assert 0.7 < a < 0.95
    ap = auprc(preds, targets)
    assert 0.7 < ap <= 1.0
    f1 = f1_score(preds, targets, threshold=0.5)
    assert 0.5 < f1 <= 1.0

    # masked: masked-out rows must not affect the score
    mask = np.asarray([True, True, True, False, True, True])
    a_masked = auroc(preds, targets, mask=mask)
    a_sub = auroc(preds[mask], targets[mask])
    assert abs(a_masked - a_sub) < 1e-9


def test_auroc_matches_sklearn_formula(rng):
    """Cross-check the rank-based AUROC against a brute-force pair count."""
    for _ in range(5):
        scores = rng.normal(size=40)
        labels = (rng.random(40) > 0.5).astype(int)
        if labels.sum() in (0, 40):
            continue
        pos = scores[labels == 1]
        neg = scores[labels == 0]
        brute = np.mean([(p > n) + 0.5 * (p == n) for p in pos for n in neg])
        fast = auroc(scores, labels.astype(float))
        assert abs(brute - fast) < 1e-9
