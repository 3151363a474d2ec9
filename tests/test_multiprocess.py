"""Simulated multi-HOST leg: two real OS processes, `jax.distributed`
initialization (Gloo CPU collectives), `host_local_slice` data sharding, and
a cross-process grad all-reduce — the one distributed code path the
single-process suite cannot execute (round-3 verdict #9). Asserts exact
data-parallel parity: the 2-process trajectory equals a single-process
full-batch run, per step, on both processes."""

import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

_WORKER = textwrap.dedent(
    """
    import sys

    import jax

    jax.config.update("jax_platforms", "cpu")

    from notorch_tpu.parallel.distributed import host_local_slice, initialize

    coordinator, pid = sys.argv[1], int(sys.argv[2])
    initialize(coordinator_address=coordinator, num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from notorch_tpu.data.graph import pad_graphs
    from notorch_tpu.models.dmpnn import build_dmpnn
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    SMIS = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "CCCC", "c1ccncc1", "CCS", "OCCO"]
    pipe = Pipeline(SmiToMol(), MolToGraph())
    graphs = [pipe(s) for s in SMIS]
    rng = np.random.default_rng(0)
    y = rng.normal(size=(len(SMIS), 1)).astype(np.float32)

    def batch_of(idx):
        gs = [graphs[i] for i in idx]
        bg = pad_graphs(gs, 64, 128, graph_cap=len(idx))
        return {
            "inputs.G": bg,
            "targets.y": y[idx],
            "targets.y_mask": np.ones((len(idx), 1), dtype=bool),
        }

    model = build_dmpnn(hidden_dim=16, depth=2, layout="flat")
    full = batch_of(list(range(len(SMIS))))
    state = model.init(jax.random.PRNGKey(0), full)

    # this host's contiguous shard of the global batch (4 molecules each)
    sl = host_local_slice(len(SMIS))
    local = batch_of(list(range(len(SMIS)))[sl])

    def loss_fn(params, batch):
        out = model.network.apply({"params": params}, dict(batch), training=False)
        from notorch_tpu.tasks.losses import MSE

        return MSE()(
            out["ffn.preds"], batch["targets.y"], mask=batch["targets.y_mask"]
        )

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    mesh = Mesh(np.array(jax.devices()), ("data",))
    sharded = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    @jax.jit
    def cross_host_mean(stacked):
        # mean over the process-sharded axis => XLA inserts the all-reduce
        return jax.tree.map(
            lambda g: jax.lax.with_sharding_constraint(
                jnp.mean(g, axis=0), replicated
            ),
            stacked,
        )

    opt = optax.sgd(1e-2)
    params = state.params
    opt_state = opt.init(params)

    # single-process oracle: full-batch trajectory (computed identically on
    # both processes — pure local jit)
    o_params, o_opt = params, opt.init(params)
    losses, o_losses = [], []
    for step in range(3):
        lv, grads = grad_fn(params, local)
        stacked = jax.tree.map(
            lambda g: jax.make_array_from_process_local_data(
                sharded, np.asarray(g)[None]
            ),
            grads,
        )
        gmean = cross_host_mean(stacked)
        gmean = jax.tree.map(lambda g: np.asarray(g.addressable_data(0)), gmean)
        updates, opt_state = opt.update(gmean, opt_state, params)
        params = optax.apply_updates(params, updates)

        o_lv, o_grads = grad_fn(o_params, full)
        o_updates, o_opt = opt.update(o_grads, o_opt, o_params)
        o_params = optax.apply_updates(o_params, o_updates)
        losses.append(float(lv))
        o_losses.append(float(o_lv))

    # grad of the full-batch mean == mean of equal-half grads => the
    # distributed trajectory must equal the oracle's EXACTLY on CPU
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        params,
        o_params,
    )
    # per-process loss on its shard is finite and the global picture agrees:
    # sum of local last-step losses across procs / 2 ~= oracle loss. Check
    # via one more all-reduce of the local loss scalar.
    lv, _ = grad_fn(params, local)
    stacked = jax.make_array_from_process_local_data(
        sharded, np.asarray(lv, np.float32).reshape(1)
    )
    global_loss = float(np.asarray(cross_host_mean(stacked).addressable_data(0)))
    o_lv, _ = grad_fn(o_params, full)
    np.testing.assert_allclose(global_loss, float(o_lv), rtol=1e-5)
    print(f"PARITY_OK pid={pid} losses={losses} oracle={o_losses}", flush=True)
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_data_parallel(tmp_path):
    import os

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coordinator = f"127.0.0.1:{_free_port()}"
    repo = str(Path(__file__).resolve().parent.parent)
    env = dict(os.environ)
    # one CPU device per process (the suite's 8-device virtual mesh flag
    # would give the 2-process mesh 16 devices)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coordinator, str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=repo,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=220)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "PARITY_OK" in out, f"proc {i} no parity line:\n{out[-3000:]}"
