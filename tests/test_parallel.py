"""Multi-device SPMD tests on the virtual 8-device CPU mesh.

The key gate (SURVEY §4): sharded and single-device steps produce identical
losses and identical updated parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from notorch_tpu.data.graph import pad_graphs
from notorch_tpu.models.dmpnn import build_dmpnn
from notorch_tpu.parallel.mesh import make_mesh
from notorch_tpu.parallel.partition import build_spmd_batch, shard_graph_edges
from notorch_tpu.parallel.spmd import SpmdTrainer
from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

PIPE = Pipeline(SmiToMol(), MolToGraph())

SMIS = [
    "CCO",
    "c1ccccc1",
    "CC(=O)Nc1ccc(O)cc1",
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
    "c1ccc2c(c1)cccc2",
    "NC(=O)c1ccccc1",
    "OCC(O)CO",
    "ClCC(Cl)CCl",
]


def _groups(n_data, per):
    graphs = [PIPE(s) for s in SMIS]
    return [graphs[i * per : (i + 1) * per] for i in range(n_data)]


def _targets(n_data, per, seed=0):
    rng = np.random.default_rng(seed)
    return {"y": rng.normal(size=(n_data, per, 1)).astype(np.float32)}


def test_shard_graph_edges_invariants():
    graphs = [PIPE(s) for s in SMIS[:4]]
    bg = pad_graphs(graphs, 64, 128, graph_cap=4, np_out=True)
    shards = shard_graph_edges(bg, 4)
    assert all(s.num_edges == 32 for s in shards)
    # every shard's rev is a local involution
    for s in shards:
        r = np.asarray(s.rev)
        assert ((r >= 0) & (r < 32)).all()
        assert (r[r] == np.arange(32)).all()
    # reassembling edge masks gives the original
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(s.edge_mask) for s in shards]), np.asarray(bg.edge_mask)
    )


@pytest.mark.multihost
def test_data_parallel_matches_single_device():
    n_data, per = 4, 2
    mesh = make_mesh({"data": n_data}, devices=jax.devices()[:n_data])
    model = build_dmpnn(hidden_dim=32, depth=2, optimizer=optax.sgd(1e-2), layout="flat")
    trainer = SpmdTrainer(model, mesh, data_axis="data")

    groups = _groups(n_data, per)
    targets = _targets(n_data, per)
    batch = build_spmd_batch(groups, targets, node_cap=64, edge_cap=64, graph_cap=per)

    state = trainer.init(jax.random.PRNGKey(0), batch)
    params0 = jax.tree.map(np.asarray, state.params)
    state, logs = trainer.train_step(state, batch)

    # single-device reference: same params, mean of per-shard losses
    ref_losses = []
    ref_grads = None
    for gi in range(n_data):
        bg = pad_graphs(groups[gi], 64, 64, graph_cap=per)
        rows = targets["y"][gi]
        single = {
            "inputs.G": bg,
            "targets.y": jnp.asarray(np.nan_to_num(rows)),
            "targets.y_mask": jnp.asarray(~np.isnan(rows)),
        }

        def loss_fn(params):
            out = model.network.apply({"params": params}, dict(single), training=True,
                                      rngs={"dropout": jax.random.PRNGKey(1)})
            terms = model._loss_terms(out)
            return sum(terms.values())

        loss, grads = jax.value_and_grad(loss_fn)(
            jax.tree.map(jnp.asarray, params0)
        )
        ref_losses.append(float(loss))
        grads = jax.tree.map(np.asarray, grads)
        ref_grads = grads if ref_grads is None else jax.tree.map(np.add, ref_grads, grads)

    np.testing.assert_allclose(float(logs["train/loss"]), np.mean(ref_losses), rtol=1e-5)
    # sgd(1e-2): delta params = -lr * mean(grads)
    mean_grads = jax.tree.map(lambda g: g / n_data, ref_grads)
    expected = jax.tree.map(lambda p, g: p - 1e-2 * g, params0, mean_grads)
    actual = jax.tree.map(np.asarray, state.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6), actual, expected
    )


@pytest.mark.multihost
def test_edge_partition_matches_single_device():
    """dp x graph-partition (2x2): losses and updates equal the unsharded run."""
    n_data, per, n_shards = 2, 2, 2
    mesh = make_mesh(
        {"data": n_data, "graph": n_shards}, devices=jax.devices()[: n_data * n_shards]
    )
    model_sharded = build_dmpnn(
        hidden_dim=32, depth=2, optimizer=optax.sgd(1e-2), graph_axis="graph",
        partition="replicate",
    )
    model_single = build_dmpnn(hidden_dim=32, depth=2, optimizer=optax.sgd(1e-2), layout="flat")
    trainer = SpmdTrainer(model_sharded, mesh, data_axis="data", graph_axis="graph")

    groups = _groups(n_data, per)
    targets = _targets(n_data, per)
    batch = build_spmd_batch(
        groups, targets, node_cap=64, edge_cap=64, graph_cap=per, n_edge_shards=n_shards
    )

    state = trainer.init(jax.random.PRNGKey(0), batch)
    params0 = jax.tree.map(np.asarray, state.params)
    state, logs = trainer.train_step(state, batch)

    ref_losses = []
    ref_grads = None
    for gi in range(n_data):
        bg = pad_graphs(groups[gi], 64, 64, graph_cap=per)
        rows = targets["y"][gi]
        single = {
            "inputs.G": bg,
            "targets.y": jnp.asarray(np.nan_to_num(rows)),
            "targets.y_mask": jnp.asarray(~np.isnan(rows)),
        }

        def loss_fn(params):
            out = model_single.network.apply(
                {"params": params}, dict(single), training=True,
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
            terms = model_single._loss_terms(out)
            return sum(terms.values())

        loss, grads = jax.value_and_grad(loss_fn)(jax.tree.map(jnp.asarray, params0))
        ref_losses.append(float(loss))
        grads = jax.tree.map(np.asarray, grads)
        ref_grads = grads if ref_grads is None else jax.tree.map(np.add, ref_grads, grads)

    np.testing.assert_allclose(float(logs["train/loss"]), np.mean(ref_losses), rtol=1e-5)
    mean_grads = jax.tree.map(lambda g: g / n_data, ref_grads)
    expected = jax.tree.map(lambda p, g: p - 1e-2 * g, params0, mean_grads)
    actual = jax.tree.map(np.asarray, state.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6), actual, expected
    )


@pytest.mark.multihost
@pytest.mark.parametrize(
    "n_data,n_shards", [(2, 2), (1, 4), (2, 4), (1, 8)]
)
def test_molecule_partition_matches_single_device(n_data, n_shards):
    """Molecule-granularity graph partitioning (nodes+edges sharded, zero
    boundary, single readout psum): losses and updates equal the unsharded
    run at 2/4/8 graph shards (VERDICT r1 #1/#6)."""
    from notorch_tpu.parallel.partition import build_molecule_spmd_batch

    per = 4
    mesh = make_mesh(
        {"data": n_data, "graph": n_shards}, devices=jax.devices()[: n_data * n_shards]
    )
    model_sharded = build_dmpnn(
        hidden_dim=32, depth=2, optimizer=optax.sgd(1e-2), graph_axis="graph",
        partition="molecule",
    )
    model_single = build_dmpnn(hidden_dim=32, depth=2, optimizer=optax.sgd(1e-2), layout="flat")
    trainer = SpmdTrainer(model_sharded, mesh, data_axis="data", graph_axis="graph")

    graphs = [PIPE(s) for s in SMIS]
    groups = [graphs[(i * per) % len(graphs) : (i * per) % len(graphs) + per]
              for i in range(n_data)]
    targets = _targets(n_data, per)
    batch = build_molecule_spmd_batch(
        groups, targets, node_cap=64, edge_cap=96, graph_cap=per,
        n_graph_shards=n_shards,
    )

    state = trainer.init(jax.random.PRNGKey(0), batch)
    params0 = jax.tree.map(np.asarray, state.params)
    state, logs = trainer.train_step(state, batch)

    ref_losses = []
    ref_grads = None
    for gi in range(n_data):
        bg = pad_graphs(groups[gi], 64, 96, graph_cap=per)
        rows = targets["y"][gi]
        single = {
            "inputs.G": bg,
            "targets.y": jnp.asarray(np.nan_to_num(rows)),
            "targets.y_mask": jnp.asarray(~np.isnan(rows)),
        }

        def loss_fn(params):
            out = model_single.network.apply(
                {"params": params}, dict(single), training=True,
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
            terms = model_single._loss_terms(out)
            return sum(terms.values())

        loss, grads = jax.value_and_grad(loss_fn)(jax.tree.map(jnp.asarray, params0))
        ref_losses.append(float(loss))
        grads = jax.tree.map(np.asarray, grads)
        ref_grads = grads if ref_grads is None else jax.tree.map(np.add, ref_grads, grads)

    np.testing.assert_allclose(float(logs["train/loss"]), np.mean(ref_losses), rtol=1e-5)
    mean_grads = jax.tree.map(lambda g: g / n_data, ref_grads)
    expected = jax.tree.map(lambda p, g: p - 1e-2 * g, params0, mean_grads)
    actual = jax.tree.map(np.asarray, state.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6),
        actual, expected,
    )


@pytest.mark.multihost
@pytest.mark.parametrize("aggregation", ["mean", "gated"])
def test_molecule_partition_cross_shard_readouts(aggregation):
    """Mean (psum'd counts) and Gated (cross-shard segment softmax) readouts
    stay exact when molecules are sharded."""
    from notorch_tpu.parallel.partition import build_molecule_spmd_batch

    n_shards, per = 4, 4
    mesh = make_mesh({"data": 1, "graph": n_shards}, devices=jax.devices()[:n_shards])
    kw = dict(hidden_dim=32, depth=2, aggregation=aggregation,
              optimizer=optax.sgd(1e-2), layout="flat")
    model_sharded = build_dmpnn(graph_axis="graph", partition="molecule", **kw)
    model_single = build_dmpnn(**kw)
    trainer = SpmdTrainer(model_sharded, mesh, data_axis="data", graph_axis="graph")

    graphs = [PIPE(s) for s in SMIS[:per]]
    targets = _targets(1, per)
    batch = build_molecule_spmd_batch(
        [graphs], targets, node_cap=64, edge_cap=96, graph_cap=per,
        n_graph_shards=n_shards,
    )
    state = trainer.init(jax.random.PRNGKey(0), batch)
    params0 = jax.tree.map(np.asarray, state.params)
    state, logs = trainer.train_step(state, batch)

    bg = pad_graphs(graphs, 64, 96, graph_cap=per)
    rows = targets["y"][0]
    single = {
        "inputs.G": bg,
        "targets.y": jnp.asarray(np.nan_to_num(rows)),
        "targets.y_mask": jnp.asarray(~np.isnan(rows)),
    }

    def loss_fn(params):
        out = model_single.network.apply(
            {"params": params}, dict(single), training=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return sum(model_single._loss_terms(out).values())

    loss, grads = jax.value_and_grad(loss_fn)(jax.tree.map(jnp.asarray, params0))
    np.testing.assert_allclose(float(logs["train/loss"]), float(loss), rtol=1e-5)
    expected = jax.tree.map(
        lambda p, g: p - 1e-2 * np.asarray(g), params0, jax.device_get(grads)
    )
    actual = jax.tree.map(np.asarray, state.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6),
        actual, expected,
    )


@pytest.mark.multihost
@pytest.mark.parametrize("n_shards", [4, 8])
def test_edge_partition_replicate_multi_shard(n_shards):
    """Legacy replicated-node edge partitioning stays gradient-exact beyond
    2 shards (VERDICT r1 #6)."""
    per = 2
    mesh = make_mesh({"data": 1, "graph": n_shards}, devices=jax.devices()[:n_shards])
    model_sharded = build_dmpnn(
        hidden_dim=32, depth=2, optimizer=optax.sgd(1e-2), graph_axis="graph",
        partition="replicate",
    )
    model_single = build_dmpnn(hidden_dim=32, depth=2, optimizer=optax.sgd(1e-2), layout="flat")
    trainer = SpmdTrainer(model_sharded, mesh, data_axis="data", graph_axis="graph")

    groups = _groups(1, per)
    targets = _targets(1, per)
    batch = build_spmd_batch(
        groups, targets, node_cap=64, edge_cap=16 * n_shards, graph_cap=per,
        n_edge_shards=n_shards,
    )
    state = trainer.init(jax.random.PRNGKey(0), batch)
    params0 = jax.tree.map(np.asarray, state.params)
    state, logs = trainer.train_step(state, batch)

    bg = pad_graphs(groups[0], 64, 16 * n_shards, graph_cap=per)
    rows = targets["y"][0]
    single = {
        "inputs.G": bg,
        "targets.y": jnp.asarray(np.nan_to_num(rows)),
        "targets.y_mask": jnp.asarray(~np.isnan(rows)),
    }

    def loss_fn(params):
        out = model_single.network.apply(
            {"params": params}, dict(single), training=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return sum(model_single._loss_terms(out).values())

    loss, grads = jax.value_and_grad(loss_fn)(jax.tree.map(jnp.asarray, params0))
    np.testing.assert_allclose(float(logs["train/loss"]), float(loss), rtol=1e-5)
    expected = jax.tree.map(
        lambda p, g: p - 1e-2 * np.asarray(g), params0, jax.device_get(grads)
    )
    actual = jax.tree.map(np.asarray, state.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6),
        actual, expected,
    )


@pytest.mark.multihost
def test_spmd_eval_step_matches_single_device():
    n_data, per = 2, 2
    mesh = make_mesh({"data": n_data}, devices=jax.devices()[:n_data])
    model = build_dmpnn(hidden_dim=16, depth=1, layout="flat")
    trainer = SpmdTrainer(model, mesh, data_axis="data")

    groups = _groups(n_data, per)
    targets = _targets(n_data, per)
    batch = build_spmd_batch(groups, targets, node_cap=64, edge_cap=64, graph_cap=per)
    state = trainer.init(jax.random.PRNGKey(0), batch)

    logs = trainer.eval_step(state.params, batch)
    # single-device mean of per-shard losses
    vals = []
    for gi in range(n_data):
        bg = pad_graphs(groups[gi], 64, 64, graph_cap=per)
        rows = targets["y"][gi]
        single = {
            "inputs.G": bg,
            "targets.y": jnp.asarray(np.nan_to_num(rows)),
            "targets.y_mask": jnp.asarray(~np.isnan(rows)),
        }
        l, _ = model.eval_step(state.params, single)
        vals.append(float(l["val/mse"]))
    np.testing.assert_allclose(float(logs["mse"]), np.mean(vals), rtol=1e-5)


@pytest.mark.multihost
def test_dense_data_parallel_matches_single_device():
    """GSPMD dense-layout dp: sharded step == single-device step exactly."""
    from notorch_tpu.data.dense import pad_graphs_dense
    from notorch_tpu.parallel.dense_dp import DenseDataParallel

    graphs = [PIPE(s) for s in SMIS]
    dbg = pad_graphs_dense(graphs, 32, 64, graph_cap=8)
    rng = np.random.default_rng(0)
    y = rng.normal(size=(8, 1)).astype(np.float32)
    batch = {"inputs.G": dbg, "targets.y": y, "targets.y_mask": np.ones_like(y, bool)}

    model = build_dmpnn(hidden_dim=16, depth=2, layout="dense", optimizer=optax.sgd(1e-2))
    # single-device reference
    state_ref = model.init(jax.random.PRNGKey(0), batch)
    params0 = jax.device_get(state_ref.params)
    state_ref, logs_ref = model.train_step(state_ref, batch)

    # sharded over 4 devices
    mesh = make_mesh({"data": 4}, devices=jax.devices()[:4])
    model2 = build_dmpnn(hidden_dim=16, depth=2, layout="dense", optimizer=optax.sgd(1e-2))
    dp = DenseDataParallel(model2, mesh)
    state = model2.init(jax.random.PRNGKey(0), batch)
    state = dp.replicate_state(state)
    state, logs = dp.train_step(state, batch)

    np.testing.assert_allclose(
        float(logs["train/loss"]), float(logs_ref["train/loss"]), rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7
        ),
        jax.device_get(state.params),
        jax.device_get(state_ref.params),
    )


@pytest.mark.multihost
def test_dense_spmd_trainer_fused_kernel_matches_single_device():
    """shard_map dense dp with the PALLAS fused kernel: sharded step ==
    single-device step (GSPMD cannot partition a pallas_call — this is the
    fused layout's multi-chip path)."""
    from notorch_tpu.data.dense import pad_graphs_dense
    from notorch_tpu.parallel.dense_dp import DenseSpmdTrainer

    graphs = [PIPE(s) for s in SMIS]
    dbg = pad_graphs_dense(graphs, 32, 64, graph_cap=8)
    rng = np.random.default_rng(0)
    y = rng.normal(size=(8, 1)).astype(np.float32)
    batch = {"inputs.G": dbg, "targets.y": y, "targets.y_mask": np.ones_like(y, bool)}

    model = build_dmpnn(
        hidden_dim=16, depth=2, layout="dense_fused", optimizer=optax.sgd(1e-2)
    )
    state_ref = model.init(jax.random.PRNGKey(0), batch)
    state_ref, logs_ref = model.train_step(state_ref, batch)

    mesh = make_mesh({"data": 4}, devices=jax.devices()[:4])
    model2 = build_dmpnn(
        hidden_dim=16, depth=2, layout="dense_fused", optimizer=optax.sgd(1e-2)
    )
    trainer = DenseSpmdTrainer(model2, mesh)
    state = trainer.init(jax.random.PRNGKey(0), batch)
    state, logs = trainer.train_step(state, batch)

    np.testing.assert_allclose(
        float(logs["train/loss"]), float(logs_ref["train/loss"]), rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7
        ),
        jax.device_get(state.params),
        jax.device_get(state_ref.params),
    )

    # eval side: pmean of shard metrics == global metric
    logs_e = trainer.eval_step(state.params, batch)
    logs_ref_e, _ = model.eval_step(state_ref.params, batch)
    np.testing.assert_allclose(
        float(logs_e["mse"]), float(logs_ref_e["val/mse"]), rtol=1e-5
    )


@pytest.mark.multihost
def test_spmd_batchnorm_stats_update():
    """Non-param collections (BatchNorm batch_stats) are threaded through the
    sharded step: stats provably update and stay replicated (VERDICT r1 #5)."""
    from notorch_tpu.model.model import Model
    from notorch_tpu.nn import agg as agg_mod
    from notorch_tpu.nn.chemprop import ChempropBlock
    from notorch_tpu.nn.embed import GraphEmbedding
    from notorch_tpu.nn.glue import BatchNorm
    from notorch_tpu.nn.mlp import MLP
    from notorch_tpu.tasks import losses as L

    modules = {
        "embed": {"module": GraphEmbedding(hidden_dim=16), "in_keys": ["inputs.G"],
                  "out_keys": ["G"]},
        "mp": {"module": ChempropBlock(hidden_dim=16, depth=1), "in_keys": ["embed.G"],
               "out_keys": ["G"]},
        "readout": {"module": agg_mod.Mean(), "in_keys": ["mp.G"], "out_keys": ["H"]},
        "norm": {"module": BatchNorm(), "in_keys": ["readout.H"], "out_keys": ["H"]},
        "ffn": {"module": MLP(input_dim=16, output_size=1), "in_keys": ["norm.H"],
                "out_keys": ["preds"]},
    }
    losses = {
        "mse": {
            "fn": L.MSE(),
            "in_keys": {"preds": "ffn.preds", "targets": "targets.y",
                        "mask": "targets.y_mask"},
            "weight": 1.0,
        }
    }
    model = Model(modules=modules, losses=losses, optimizer=optax.sgd(1e-2))

    n_data, per = 2, 2
    mesh = make_mesh({"data": n_data}, devices=jax.devices()[:n_data])
    trainer = SpmdTrainer(model, mesh, data_axis="data")
    batch = build_spmd_batch(
        _groups(n_data, per), _targets(n_data, per), node_cap=64, edge_cap=64,
        graph_cap=per,
    )
    state = trainer.init(jax.random.PRNGKey(0), batch)
    assert "batch_stats" in state.extra_vars
    stats0 = jax.device_get(state.extra_vars)

    state, logs = trainer.train_step(state, batch)
    assert np.isfinite(float(logs["train/loss"]))
    stats1 = jax.device_get(state.extra_vars)
    changed = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(stats0), jax.tree.leaves(stats1))
    )
    assert changed, "batch_stats did not update under SPMD"

    # eval path consumes the updated stats
    logs_e = trainer.eval_step(state.params, batch, state.extra_vars)
    assert np.isfinite(float(logs_e["mse"]))


@pytest.mark.multihost
def test_spmd_multi_step_dispatch_matches_single_steps():
    """SpmdTrainer.train_steps (lax.scan of the sharded step) advances the
    state identically to calling train_step K times."""
    n_data, per, K = 4, 2, 3
    mesh = make_mesh({"data": n_data}, devices=jax.devices()[:n_data])

    def batches():
        return [
            build_spmd_batch(
                _groups(n_data, per), _targets(n_data, per, seed=k),
                node_cap=64, edge_cap=64, graph_cap=per,
            )
            for k in range(K)
        ]

    def fresh():
        model = build_dmpnn(hidden_dim=32, depth=2, optimizer=optax.sgd(1e-2), layout="flat")
        trainer = SpmdTrainer(model, mesh, data_axis="data")
        state = trainer.init(jax.random.PRNGKey(0), batches()[0])
        return trainer, state

    trainer, state = fresh()
    for b in batches():
        state, logs = trainer.train_step(state, b)
    seq_params = jax.tree.map(np.asarray, state.params)

    trainer2, state2 = fresh()
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *batches())
    state2, logs2 = trainer2.train_steps(state2, stacked)
    assert int(state2.step) == K
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
        seq_params,
        jax.device_get(state2.params),
    )


class TestExpertParallel:
    """EP via GSPMD sharding of the stacked expert axis (parallel/expert.py)."""

    def _moe(self):
        from notorch_tpu.nn.mlp import MLP
        from notorch_tpu.nn.moe import MixtureOfExperts

        return MixtureOfExperts(
            expert_fn=lambda: MLP(input_dim=8, output_size=8, hidden_dim=16),
            num_experts=4,
            router_kind="dense",
        )

    def test_specs_target_expert_stacks(self):
        import jax

        from notorch_tpu.parallel.expert import expert_partition_specs
        from notorch_tpu.parallel.mesh import make_mesh

        moe = self._moe()
        x = jnp.ones((6, 8), jnp.float32)
        params = moe.init(jax.random.PRNGKey(0), x)
        mesh = make_mesh({"data": 2, "expert": 4})
        specs = expert_partition_specs(params, mesh)
        expert_spec = specs["params"]["experts"]["dense_0"]["kernel"].spec
        assert expert_spec[0] == "expert"
        router_spec = specs["params"]["DenseRouter_0"]["W_g"]["kernel"].spec
        assert all(s is None for s in router_spec)

    def test_sharded_forward_and_grads_match_unsharded(self):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from notorch_tpu.parallel.expert import shard_expert_params
        from notorch_tpu.parallel.mesh import make_mesh

        moe = self._moe()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))
        params = moe.init(jax.random.PRNGKey(1), x)

        def loss(p, x):
            out, aux = moe.apply(p, x)
            return (out**2).mean() + 0.1 * aux

        ref_loss, ref_grads = jax.value_and_grad(loss)(params, x)

        mesh = make_mesh({"data": 2, "expert": 4})
        p_sharded = shard_expert_params(params, mesh)
        # the stacked expert kernels actually live sharded on the expert axis
        k = p_sharded["params"]["experts"]["dense_0"]["kernel"]
        assert k.sharding.spec[0] == "expert"
        x_sharded = jax.device_put(x, NamedSharding(mesh, P("data")))
        ep_loss, ep_grads = jax.jit(jax.value_and_grad(loss))(p_sharded, x_sharded)

        np.testing.assert_allclose(float(ep_loss), float(ref_loss), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(ep_grads)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

    def test_ep_training_steps_match(self):
        """A few Adam steps with EP-sharded params track the unsharded run."""
        import jax
        import optax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from notorch_tpu.parallel.expert import shard_expert_params
        from notorch_tpu.parallel.mesh import make_mesh

        moe = self._moe()
        rng = np.random.default_rng(1)
        xs = [jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32)) for _ in range(3)]
        ys = [jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32)) for _ in range(3)]
        params0 = moe.init(jax.random.PRNGKey(2), xs[0])
        opt = optax.adam(1e-2)

        def loss(p, x, y):
            out, aux = moe.apply(p, x)
            return ((out - y) ** 2).mean() + 0.01 * aux

        @jax.jit
        def step(p, o, x, y):
            l, g = jax.value_and_grad(loss)(p, x, y)
            up, o = opt.update(g, o, p)
            return optax.apply_updates(p, up), o, l

        p_ref, o_ref = params0, opt.init(params0)
        for x, y in zip(xs, ys):
            p_ref, o_ref, _ = step(p_ref, o_ref, x, y)

        mesh = make_mesh({"data": 2, "expert": 4})
        p_ep = shard_expert_params(params0, mesh)
        o_ep = opt.init(p_ep)
        for x, y in zip(xs, ys):
            x = jax.device_put(x, NamedSharding(mesh, P("data")))
            y = jax.device_put(y, NamedSharding(mesh, P("data")))
            p_ep, o_ep, l = step(p_ep, o_ep, x, y)
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_ep)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)
