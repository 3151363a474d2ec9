"""TPU probe: the device-leaf stacking hazard.

``np.stack`` on jax.Array leaves silently round-trips every leaf through the
host (on the tunneled chip: ~34 ms latency per leaf per batch), while
``notorch_tpu.data.batching.stack_trees`` keeps device leaves on device
(``jnp.stack``). This script measures both on an 8-batch group of dense lipo
batches whose leaves are already on device — the exact situation inside
``PrefetchLoader(stack=K)``.

One JSON line per method. Sized to complete on its own — NEVER kill a
TPU-attached process.

Run:  python scripts/bench_stack_trees.py > out 2>&1 &
"""

from __future__ import annotations

import csv
import json
import os
import threading
import time


def _arm_watchdog(seconds: int = 1200) -> None:
    def die():
        print(f"watchdog: no completion within {seconds}s; aborting", flush=True)
        os._exit(3)

    t = threading.Timer(seconds, die)
    t.daemon = True
    t.start()


def main() -> None:
    _arm_watchdog()
    import sys

    import jax

    if "--cpu" in sys.argv:  # smoke-test mode (the axon TPU plugin ignores
        jax.config.update("jax_platforms", "cpu")  # JAX_PLATFORMS from env)
    import jax.numpy as jnp
    import numpy as np

    from notorch_tpu.data.batching import DataLoader, stack_trees
    from notorch_tpu.data.dataset import MolecularDataset, TargetSpec, TransformManager
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    print("devices:", jax.devices(), flush=True)

    path = os.path.join(os.path.dirname(__file__), "..", "tests", "data", "lipo.csv")
    with open(path) as f:
        rows = list(csv.DictReader(f))[:512]
    ds = MolecularDataset(
        {"smiles": [r["smiles"] for r in rows], "y": [float(r["lipo"]) for r in rows]},
        transforms={
            "graph": TransformManager(Pipeline(SmiToMol(), MolToGraph()), in_key="smiles")
        },
        targets={"y": TargetSpec(columns=["y"], task="regression")},
    )
    loader = DataLoader(ds, batch_size=64, layout="dense", sort_by_size=True)
    from notorch_tpu.data.batching import shape_signature

    by_sig: dict = {}
    for b in loader:
        by_sig.setdefault(shape_signature(b), []).append(b)
    group = max(by_sig.values(), key=len)[:8]
    group = [jax.device_put(b) for b in group]
    # force transfers to finish before timing
    for b in group:
        jax.block_until_ready(jax.tree.leaves(b))
    n_leaves = len(jax.tree.leaves(group[0]))
    print(f"group: {len(group)} batches x {n_leaves} device leaves", flush=True)

    def time_it(fn, iters=5):
        fn()  # warm
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn()
            # sync: fetch one scalar from one leaf
            leaf = jax.tree.leaves(out)[0]
            if isinstance(leaf, jax.Array):
                float(jnp.sum(leaf.astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        return best

    t_np = time_it(lambda: jax.tree.map(lambda *xs: np.stack(xs), *group))
    t_dev = time_it(lambda: stack_trees(group))
    print(
        json.dumps(
            {"name": "np_stack_roundtrip", "seconds_per_group": round(t_np, 3)}
        ),
        flush=True,
    )
    print(
        json.dumps(
            {"name": "stack_trees_on_device", "seconds_per_group": round(t_dev, 3),
             "speedup": round(t_np / max(t_dev, 1e-9), 1)}
        ),
        flush=True,
    )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
