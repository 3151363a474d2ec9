"""Masked-atom self-supervised pretraining (the PCQM4Mv2-style config 5
capability, exercised at toy scale) + fit auto-resume."""

import jax
import numpy as np

from notorch_tpu.data.graph import pad_graphs
from notorch_tpu.models.pretrain import MaskAtoms, build_masked_atom_pretrainer
from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

PIPE = Pipeline(SmiToMol(), MolToGraph())


def _batch(smis, seed=0):
    masker = MaskAtoms(mask_rate=0.25, seed=seed)
    graphs = [masker(PIPE(s)) for s in smis]
    bg, labels = MaskAtoms.collate(graphs)
    return {"inputs.G": bg, "inputs.node_labels": labels}


def test_mask_atoms_semantics():
    masker = MaskAtoms(mask_rate=0.3, seed=0)
    g = PIPE("CC(=O)Nc1ccc(O)cc1")
    orig = g.node_types.copy()
    out = masker(g)
    masked = out.node_labels >= 0
    assert masked.any() and not masked.all()
    # masked rows point at per-family UNK slots; unmasked rows unchanged
    np.testing.assert_array_equal(out.node_types[~masked], orig[~masked])
    assert (out.node_types[masked] != orig[masked]).any()
    # labels record the original element family id
    np.testing.assert_array_equal(out.node_labels[masked], orig[masked, 0])


def test_pretraining_learns(smis):
    model = build_masked_atom_pretrainer(hidden_dim=64, depth=2)
    batch = _batch(smis[:32])
    state = model.init(jax.random.PRNGKey(0), batch)
    losses = []
    for _ in range(60):
        state, logs = model.train_step(state, batch)
        losses.append(float(logs["train/loss"]))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    # masked-element accuracy should be far above chance (11 classes)
    out = model.apply(state.params, batch)
    logits = np.asarray(out["head.logits"])
    labels = np.asarray(batch["inputs.node_labels"])
    m = labels >= 0
    acc = (logits[m].argmax(-1) == labels[m]).mean()
    assert acc > 0.5, acc


def test_fit_resume(tmp_path, smis):
    import optax

    from notorch_tpu.data.batching import DataLoader
    from notorch_tpu.data.dataset import MolecularDataset, TargetSpec, TransformManager
    from notorch_tpu.models.dmpnn import build_dmpnn
    from notorch_tpu.training.checkpoint import Checkpointer
    from notorch_tpu.training.loop import fit

    rng = np.random.default_rng(0)
    ds = MolecularDataset(
        {"smiles": smis[:16], "y": rng.normal(size=16)},
        transforms={"g": TransformManager(PIPE, in_key="smiles")},
        targets={"y": TargetSpec(columns=["y"])},
    )
    model = build_dmpnn(hidden_dim=16, depth=1, optimizer=optax.adam(1e-3), layout="flat")
    loader = DataLoader(ds, batch_size=16)
    ckpt = Checkpointer(tmp_path / "ck")
    state = model.init(jax.random.PRNGKey(0), next(iter(loader)))
    r1 = fit(model, state, loader, epochs=2, checkpointer=ckpt)
    assert ckpt.latest_step() == 2

    # resume from checkpoint: a fresh state gets replaced by the saved one.
    # ``epochs`` is the run's TOTAL — the cursor sidecar knows 2 epochs are
    # done, so epochs=3 trains exactly one more
    fresh = model.init(jax.random.PRNGKey(9), next(iter(loader)))
    r2 = fit(model, fresh, loader, epochs=3, checkpointer=ckpt, resume=True)
    assert int(r2.state.step) == 3  # 2 restored + 1 more epoch (1 step/epoch)
    assert len(r2.history) == 1

    # a finished run resumes as a no-op
    r3 = fit(model, fresh, loader, epochs=3, checkpointer=ckpt, resume=True)
    assert int(r3.state.step) == 3 and r3.history == []
