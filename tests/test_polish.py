"""Round-2 polish parity tests: MCC/spectral losses, count-weighted
evaluate(), parquet ingestion + inline config resolvers, __repr__s."""

import numpy as np
import pytest

import jax.numpy as jnp


class TestMCCLosses:
    def test_binary_mcc_perfect_predictions(self):
        from notorch_tpu.tasks.losses import BinaryMCCLoss

        y = np.array([[1.0], [0.0], [1.0], [0.0]], np.float32)
        # confident correct logits -> MCC ~ 1 -> loss ~ 0
        logits = (y * 2 - 1) * 12.0
        loss = BinaryMCCLoss()(jnp.asarray(logits), jnp.asarray(y))
        assert float(loss) < 1e-3

    def test_binary_mcc_inverted_predictions(self):
        from notorch_tpu.tasks.losses import BinaryMCCLoss

        y = np.array([[1.0], [0.0], [1.0], [0.0]], np.float32)
        logits = -(y * 2 - 1) * 12.0
        loss = BinaryMCCLoss()(jnp.asarray(logits), jnp.asarray(y))
        assert float(loss) > 1.99  # MCC ~ -1 -> loss ~ 2

    def test_binary_mcc_masked_matches_subset(self):
        from notorch_tpu.tasks.losses import BinaryMCCLoss

        rng = np.random.default_rng(0)
        logits = rng.normal(size=(10, 2)).astype(np.float32)
        y = (rng.random((10, 2)) > 0.5).astype(np.float32)
        mask = np.ones((10, 2), bool)
        mask[7:] = False
        fn = BinaryMCCLoss()
        masked = float(fn(jnp.asarray(logits), jnp.asarray(y), mask=jnp.asarray(mask)))
        subset = float(fn(jnp.asarray(logits[:7]), jnp.asarray(y[:7])))
        np.testing.assert_allclose(masked, subset, rtol=1e-5)

    def test_multiclass_mcc_perfect_is_zero(self):
        from notorch_tpu.tasks.losses import MulticlassMCCLoss

        y = np.array([[0], [1], [2], [1]], np.int32)
        probs = np.eye(3, dtype=np.float32)[y.ravel()][:, None, :]
        loss = MulticlassMCCLoss(from_logits=False)(
            jnp.asarray(probs), jnp.asarray(y)
        )
        assert float(loss) < 1e-5

    def test_multiclass_mcc_matches_sklearn_form(self):
        """Hard predictions: 1 - loss == sklearn matthews_corrcoef."""
        from notorch_tpu.tasks.losses import MulticlassMCCLoss

        rng = np.random.default_rng(1)
        y = rng.integers(0, 3, size=(40, 1)).astype(np.int32)
        pred_cls = rng.integers(0, 3, size=(40, 1)).astype(np.int32)
        probs = np.eye(3, dtype=np.float32)[pred_cls.ravel()][:, None, :]
        loss = float(
            MulticlassMCCLoss(from_logits=False)(jnp.asarray(probs), jnp.asarray(y))
        )
        # independent reference implementation of the covariance form
        t = np.eye(3)[y.ravel()]
        p = np.eye(3)[pred_cls.ravel()]
        c = (t * p).sum()
        s = len(y)
        pk = p.sum(0)
        tk = t.sum(0)
        num = c * s - (pk * tk).sum()
        den = np.sqrt((s**2 - (pk * pk).sum()) * (s**2 - (tk * tk).sum()))
        mcc = 0.0 if den == 0 else num / den
        np.testing.assert_allclose(1 - loss, mcc, atol=1e-5)


class TestSpectralLosses:
    def test_sid_zero_for_identical_normalized(self):
        from notorch_tpu.tasks.losses import SID

        rng = np.random.default_rng(0)
        spec = rng.random((4, 16)).astype(np.float32) + 0.1
        spec = spec / spec.sum(1, keepdims=True)
        loss = SID()(jnp.asarray(spec), jnp.asarray(spec))
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)

    def test_sid_positive_and_masked(self):
        from notorch_tpu.tasks.losses import SID

        rng = np.random.default_rng(1)
        preds = rng.random((3, 8)).astype(np.float32) + 0.1
        targets = rng.random((3, 8)).astype(np.float32) + 0.1
        targets = targets / targets.sum(1, keepdims=True)
        mask = np.ones((3, 8), bool)
        mask[:, 6:] = False
        # renormalize targets within mask for a valid masked distribution
        t = np.where(mask, targets, 0)
        t = t / t.sum(1, keepdims=True)
        loss = SID(threshold=1e-6)(
            jnp.asarray(preds), jnp.asarray(t), mask=jnp.asarray(mask)
        )
        assert float(loss) > 0

    def test_wasserstein_shifted_mass(self):
        from notorch_tpu.tasks.losses import Wasserstein

        target = np.zeros((1, 5), np.float32)
        target[0, 0] = 1.0
        pred = np.zeros((1, 5), np.float32)
        pred[0, 4] = 1.0
        loss = Wasserstein()(jnp.asarray(pred), jnp.asarray(target))
        # mass moved 4 bins; per-element mean over 5 bins = 4/5
        np.testing.assert_allclose(float(loss), 0.8, atol=1e-6)


class TestCountWeightedEvaluate:
    def test_ragged_final_batch_matches_global_metric(self):
        import jax
        import optax

        from notorch_tpu.models.dmpnn import build_dmpnn
        from notorch_tpu.data.graph import pad_graphs
        from notorch_tpu.training.loop import evaluate
        from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

        pipe = Pipeline(SmiToMol(), MolToGraph())
        smis = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "CCC", "COC", "CCCl"]
        graphs = [pipe(s) for s in smis]
        rng = np.random.default_rng(0)
        y = rng.normal(size=(len(smis), 1)).astype(np.float32)

        model = build_dmpnn(hidden_dim=16, depth=1, optimizer=optax.sgd(1e-3), layout="flat")

        def make_batch(gs, ys):
            bg = pad_graphs(gs, 64, 128, graph_cap=len(gs))
            return {
                "inputs.G": bg,
                "targets.y": jnp.asarray(ys),
                "targets.y_mask": jnp.ones_like(ys, bool),
            }

        # batches of 4 + ragged 3
        batches = [make_batch(graphs[:4], y[:4]), make_batch(graphs[4:], y[4:])]
        state = model.init(jax.random.PRNGKey(0), batches[0])
        results = evaluate(model, state.params, batches)

        # global masked MSE over all 7 graphs in one batch
        full = make_batch(graphs, y)
        logs, _ = model.eval_step(state.params, full)
        np.testing.assert_allclose(
            results["val/mse"], float(logs["val/mse"]), rtol=1e-5
        )

    def test_count_keys_not_leaked(self):
        import jax
        import optax

        from notorch_tpu.models.dmpnn import build_dmpnn
        from notorch_tpu.data.graph import pad_graphs
        from notorch_tpu.training.loop import evaluate
        from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

        pipe = Pipeline(SmiToMol(), MolToGraph())
        graphs = [pipe("CCO"), pipe("CCN")]
        y = np.zeros((2, 1), np.float32)
        bg = pad_graphs(graphs, 32, 64, graph_cap=2)
        batch = {
            "inputs.G": bg,
            "targets.y": jnp.asarray(y),
            "targets.y_mask": jnp.ones_like(y, bool),
        }
        model = build_dmpnn(hidden_dim=16, depth=1, optimizer=optax.sgd(1e-3), layout="flat")
        state = model.init(jax.random.PRNGKey(0), batch)
        results = evaluate(model, state.params, [batch])
        assert not any(k.startswith("_count/") for k in results)


class TestResolversAndParquet:
    def test_inline_csv_and_len_resolvers(self, tmp_path):
        from notorch_tpu.cli.train import resolve_config

        p = tmp_path / "t.csv"
        p.write_text("smiles,y\nCCO,1.0\nCCN,2.0\n")
        cfg = {
            "data": {"csv": f"${{csv:{p}}}"},
            "trainer": {"steps": f"${{len:data.csv}}"},
        }
        out = resolve_config(cfg)
        assert out["trainer"]["steps"] == 2
        assert list(out["data"]["csv"].columns) == ["smiles", "y"]

    def test_parquet_ingestion(self, tmp_path):
        import pandas as pd

        from notorch_tpu.cli.train import _read_table

        df = pd.DataFrame({"smiles": ["CCO", "CCN"], "y": [1.0, 2.0]})
        p = tmp_path / "t.parquet"
        df.to_parquet(p)
        out = _read_table({"parquet": str(p)})
        assert len(out) == 2
        out2 = _read_table({"csv": str(p)})  # extension dispatch
        assert len(out2) == 2

    def test_build_dataset_from_resolved_frame(self, tmp_path):
        import pandas as pd

        from notorch_tpu.cli.train import build_dataset

        df = pd.DataFrame({"smiles": ["CCO", "CCN"], "y": [1.0, 2.0]})
        ds = build_dataset(
            {
                "csv": df,
                "targets": {"y": {"columns": ["y"], "task": "regression"}},
            }
        )
        assert len(ds.records) == 2


class TestUnknownElement:
    def test_unknown_bracket_element_rejected(self):
        from notorch_tpu.chem.smiles import SmilesParseError, parse_smiles

        with pytest.raises(SmilesParseError, match="unknown element"):
            parse_smiles("C[Zz]C")

    def test_exotic_valid_elements_parse(self):
        from notorch_tpu.chem.smiles import parse_smiles

        for s in ["[Se]", "[Fe+2]", "[Pt]", "[te]"]:
            assert parse_smiles(s).atoms


class TestReprs:
    def test_graph_repr_compact(self):
        from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

        g = Pipeline(SmiToMol(), MolToGraph())("CCO")
        r = repr(g)
        assert r.startswith("Graph(V=") and len(r) < 200

    def test_batched_graph_repr_no_arrays(self):
        from notorch_tpu.data.graph import pad_graphs
        from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

        pipe = Pipeline(SmiToMol(), MolToGraph())
        bg = pad_graphs([pipe("CCO")], 16, 16, graph_cap=1)
        r = repr(bg)
        assert "BatchedGraph(V_cap=16" in r and len(r) < 300

    def test_dataset_repr(self):
        import pandas as pd

        from notorch_tpu.data.dataset import MolecularDataset, TargetSpec
        from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

        df = pd.DataFrame({"smiles": ["CCO"], "y": [1.0]})
        ds = MolecularDataset(
            df,
            transforms={"graph": Pipeline(SmiToMol(), MolToGraph())},
            targets={"y": TargetSpec(columns=["y"], task="regression")},
        )
        r = repr(ds)
        assert "MolecularDataset(n=1" in r and "targets" in r
