"""SchNet (and GVP) on the chip: forward + train-step rates (VERDICT r2 #6).

The reference's spatial hot loop is the continuous-filter convolution over a
radius graph (reference ``notorch/nn/spatial/schnet.py:35-46``, dynamic
``radius_graph`` + scatter). The TPU form is static-K nearest neighbors
(``nn/spatial/neighbors.py``: one [N, N] masked distance matrix + ``top_k``)
and a masked K-axis reduce — dense, MXU/VPU-shaped, no scatter.

Metric: CFConv neighbor interactions/s = real_atoms x K x depth x chain / t
(forward), and the same through ``value_and_grad`` + param update math for
the train number. Methodology follows bench.py: on-device ``fori_loop``
chains sized >= 1 s (the tunnel's 30-50 ms latency floor + early-returning
block_until_ready make per-call timing meaningless), scalar fetch to sync.

Synthetic QM9-scale clouds (10-25 atoms, ~1.7 A spacing) — the real QM9
coordinates are not in the image (BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np


def make_clouds(n_mols: int, seed: int = 0):
    from notorch_tpu.data.point_cloud import PointCloud, pad_point_clouds

    rng = np.random.default_rng(seed)
    clouds = []
    n_atoms = 0
    for _ in range(n_mols):
        n = int(rng.integers(10, 26))
        n_atoms += n
        side = (n * 8.0) ** (1.0 / 3.0)  # ~realistic density
        coords = rng.uniform(0, side, size=(n, 3)).astype(np.float32)
        types = rng.integers(0, 9, size=(n, 1)).astype(np.int32)
        clouds.append(PointCloud(types, coords))
    cap = -(-(n_atoms + 1) // 256) * 256
    return pad_point_clouds(clouds, node_cap=cap, graph_cap=n_mols), n_atoms


def measure(run_scalar, target_seconds: float = 1.2):
    probe = run_scalar(5)
    float(probe())
    t0 = time.perf_counter()
    float(probe())
    dt5 = time.perf_counter() - t0
    chain = max(10, min(2000, int(target_seconds / max(dt5 / 5, 1e-5))))
    run = run_scalar(chain)
    float(run())
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(run())
        best = min(best, time.perf_counter() - t0)
    return best, chain


def bench_schnet(n_mols=128, hidden=128, depth=3, K=16, radius=5.0, window=25):
    import jax
    import jax.numpy as jnp

    from notorch_tpu.nn.spatial.pointwise import PointwiseEmbed
    from notorch_tpu.nn.spatial.schnet import SchnetBlock

    P, real_atoms = make_clouds(n_mols)
    embed = PointwiseEmbed(num_types=16, hidden_dim=hidden)
    key = jax.random.PRNGKey(0)
    ev = embed.init(key, P)
    P1 = embed.apply(ev, P)

    def rates(block, tag):
        bv = block.init(key, P1)

        # honest per-step accounting: fresh batches mean ONE neighbor build
        # per step, so the chain must carry the coords (a tiny feats-coupled
        # perturbation defeats XLA's loop-invariant hoisting of the build);
        # a coords-invariant chain times the layer math alone.
        def make_fwd_per_step(chain):
            @jax.jit
            def run(bv, P1):
                def body(_, carry):
                    feats, coords = carry
                    out = block.apply(
                        bv, P1.update(node_feats=feats, coords=coords)
                    ).node_feats
                    return out, coords + 1e-30 * out[:, :3]

                fN, _ = jax.lax.fori_loop(
                    0, chain, body, (P1.node_feats, P1.coords)
                )
                return jnp.sum(fN.astype(jnp.float32))

            return lambda: run(bv, P1)

        def make_fwd_hoisted(chain):
            @jax.jit
            def run(bv, P1):
                def body(_, feats):
                    return block.apply(bv, P1.update(node_feats=feats)).node_feats

                return jnp.sum(
                    jax.lax.fori_loop(0, chain, body, P1.node_feats).astype(jnp.float32)
                )

            return lambda: run(bv, P1)

        pbest, pchain = measure(make_fwd_per_step)
        hbest, hchain = measure(make_fwd_hoisted)

        def make_train(chain):
            @jax.jit
            def run(bv, P1):
                def step(carry, _):
                    params, coords = carry
                    Pc = P1.update(coords=coords)

                    def loss(p):
                        out = block.apply(p, Pc)
                        return jnp.sum(out.node_feats**2)

                    g = jax.grad(loss)(params)
                    new = jax.tree.map(lambda p, gg: p - 1e-9 * gg, params, g)
                    # couple coords to the step so the neighbor build stays
                    # inside the chain (as with fresh batches)
                    c2 = coords + 1e-30 * jax.tree.leaves(g)[0].sum()
                    return (new, c2), ()

                (pN, _), _ = jax.lax.scan(
                    step, (bv, P1.coords), None, length=chain
                )
                return jnp.sum(
                    jnp.asarray(
                        [jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(pN)]
                    )
                )

            return lambda: run(bv, P1)

        tbest, tchain = measure(make_train)
        return {
            f"schnet{tag}_fwd_interactions_per_sec": round(
                real_atoms * K * depth * pchain / pbest, 1
            ),
            f"schnet{tag}_fwd_layers_only_interactions_per_sec": round(
                real_atoms * K * depth * hchain / hbest, 1
            ),
            f"schnet{tag}_train_interactions_per_sec": round(
                real_atoms * K * depth * tchain / tbest, 1
            ),
        }

    out = {
        "real_atoms": real_atoms,
        "node_cap": int(P.num_nodes),
        "K": K,
        "depth": depth,
        "hidden": hidden,
        "window": window,
    }
    out.update(
        rates(
            SchnetBlock(hidden_dim=hidden, depth=depth, radius=radius,
                        max_neighbors=K),
            "",
        )
    )
    out.update(
        rates(
            SchnetBlock(hidden_dim=hidden, depth=depth, radius=radius,
                        max_neighbors=K, neighbor_window=window),
            "_banded",
        )
    )
    return out


def bench_gvp(n_mols=128, scalar_dim=64, vector_dim=8, depth=3, K=16, window=25):
    import jax
    import jax.numpy as jnp

    from notorch_tpu.nn.spatial.gvp import GvpGNNBlock

    P, real_atoms = make_clouds(n_mols)
    rng = np.random.default_rng(1)
    P = P.update(
        node_feats=jnp.asarray(
            rng.normal(size=(P.num_nodes, scalar_dim)).astype(np.float32)
        )
    )
    # banded static-slice neighbor search: the O(N^2) top_k build measured
    # 2569us standalone vs 86.9us banded (round 5); clouds are <= 25 atoms
    block = GvpGNNBlock(
        scalar_dim=scalar_dim, vector_dim=vector_dim, depth=depth,
        radius=5.0, max_neighbors=K, neighbor_window=window,
    )
    bv = block.init(jax.random.PRNGKey(0), P)

    def make_fwd(chain):
        @jax.jit
        def run(bv, P):
            def body(_, carry):
                feats, coords = carry
                out = block.apply(
                    bv, P.update(node_feats=feats, coords=coords)
                ).node_feats
                # couple coords to the output so the neighbor build stays
                # inside the chain (fresh-batch accounting, as in bench_schnet)
                return out, coords + 1e-30 * out[:, :3]

            fN, _ = jax.lax.fori_loop(0, chain, body, (P.node_feats, P.coords))
            return jnp.sum(fN.astype(jnp.float32))

        return lambda: run(bv, P)

    fbest, fchain = measure(make_fwd)

    # fwd+bwd through value_and_grad + a param update — the GVP train rate
    # the round-3 verdict flagged as missing (weak #3)
    def make_train(chain):
        @jax.jit
        def run(bv, P):
            def step(carry, _):
                params, coords = carry
                Pc = P.update(coords=coords)

                def loss(p):
                    out = block.apply(p, Pc)
                    return jnp.sum(out.node_feats**2)

                g = jax.grad(loss)(params)
                new = jax.tree.map(lambda p, gg: p - 1e-9 * gg, params, g)
                c2 = coords + 1e-30 * jax.tree.leaves(g)[0].sum()
                return (new, c2), ()

            (pN, _), _ = jax.lax.scan(step, (bv, P.coords), None, length=chain)
            return jnp.sum(
                jnp.asarray(
                    [jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(pN)]
                )
            )

        return lambda: run(bv, P)

    tbest, tchain = measure(make_train)
    return {
        "gvp_fwd_interactions_per_sec": round(
            real_atoms * K * depth * fchain / fbest, 1
        ),
        "gvp_train_interactions_per_sec": round(
            real_atoms * K * depth * tchain / tbest, 1
        ),
        "gvp_dims": [scalar_dim, vector_dim],
    }


def bench_painn(n_atoms=4096, scalar_dim=128, vector_dim=16, depth=3):
    """PaiNN GatedEquivariantBlock (pointwise (s, v) -> (s, v) readout head,
    reference ``notorch/nn/spatial/painn.py``): per-ATOM rate — the block has
    no neighbor structure, so the metric is atom-layer updates/s."""
    import jax
    import jax.numpy as jnp

    from notorch_tpu.nn.spatial.painn import GatedEquivariantBlock

    rng = np.random.default_rng(2)
    s = jnp.asarray(rng.normal(size=(n_atoms, scalar_dim)).astype(np.float32))
    v = jnp.asarray(
        rng.normal(size=(n_atoms, 3, vector_dim)).astype(np.float32)
    )
    block = GatedEquivariantBlock(scalar_dim=scalar_dim, vector_dim=vector_dim)
    bv = block.init(jax.random.PRNGKey(0), (s, v))

    def make_fwd(chain):
        @jax.jit
        def run(bv, s, v):
            def body(_, sv):
                return block.apply(bv, sv)

            sN, vN = jax.lax.fori_loop(0, chain, body, (s, v))
            return jnp.sum(sN.astype(jnp.float32)) + jnp.sum(vN.astype(jnp.float32))

        return lambda: run(bv, s, v)

    fbest, fchain = measure(make_fwd)

    def make_train(chain):
        @jax.jit
        def run(bv, s, v):
            def step(params, _):
                def loss(p):
                    so, vo = block.apply(p, (s, v))
                    return jnp.sum(so**2) + jnp.sum(vo**2)

                g = jax.grad(loss)(params)
                return jax.tree.map(lambda p, gg: p - 1e-9 * gg, params, g), ()

            pN, _ = jax.lax.scan(step, bv, None, length=chain)
            return jnp.sum(
                jnp.asarray(
                    [jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(pN)]
                )
            )

        return lambda: run(bv, s, v)

    tbest, tchain = measure(make_train)
    return {
        "painn_geb_fwd_atoms_per_sec": round(n_atoms * fchain / fbest, 1),
        "painn_geb_train_atoms_per_sec": round(n_atoms * tchain / tbest, 1),
        "painn_geb_dims": [scalar_dim, vector_dim],
    }


def _arm_watchdog(seconds: int = 2400) -> None:
    """Exit cleanly if the device never responds — NEVER kill a
    TPU-attached process from outside (wedges the device ~45 min)."""
    import os
    import threading

    def die():
        print(f"watchdog: no completion within {seconds}s; aborting", flush=True)
        os._exit(3)

    t = threading.Timer(seconds, die)
    t.daemon = True
    t.start()


def main():
    import jax

    _arm_watchdog()
    out = {"device": jax.devices()[0].device_kind}
    out.update(bench_schnet())
    try:
        out.update(bench_gvp())
    except Exception as e:  # GVP variant surface may differ; SchNet is the row
        out["gvp_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        out.update(bench_painn())
    except Exception as e:
        out["painn_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
