"""TPU benchmark: multi-step dispatch ceiling — K train steps per dispatch.

Redispatches the SAME stacked group of K 64-mol lipo batches (so host input
cost is zero) with one scalar-fetch sync per dispatch, sweeping K. This
isolates the device-side train-step rate from the input pipeline: as K grows
the tunnel/dispatch latency amortizes and steps/s approaches the device
compute roofline (measured 471 steps/s at K=128 on v5e, ~2.1 ms/step).

One JSON line per K. Sized to complete on its own — NEVER kill a
TPU-attached process.

Run:  python scripts/bench_k_sweep.py > out 2>&1 &
"""

from __future__ import annotations

import csv
import json
import os
import threading
import time


def _arm_watchdog(seconds: int = 2400) -> None:
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
    n_rows, ks, reps = 512, (1, 8, 32, 64, 128), 400
    for a in sys.argv[1:]:
        if a.startswith("--limit="):
            n_rows = int(a.split("=")[1])
        if a.startswith("--smoke"):
            ks, reps = (1, 8), 16
    import numpy as np

    from notorch_tpu.data.batching import DataLoader, stack_trees
    from notorch_tpu.data.dataset import MolecularDataset, TargetSpec, TransformManager
    from notorch_tpu.models.dmpnn import build_dmpnn
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    print("devices:", jax.devices(), flush=True)

    path = os.path.join(os.path.dirname(__file__), "..", "tests", "data", "lipo.csv")
    with open(path) as f:
        rows = list(csv.DictReader(f))[:n_rows]
    ds = MolecularDataset(
        {"smiles": [r["smiles"] for r in rows], "y": [float(r["lipo"]) for r in rows]},
        transforms={
            "graph": TransformManager(Pipeline(SmiToMol(), MolToGraph()), in_key="smiles")
        },
        targets={"y": TargetSpec(columns=["y"], task="regression")},
    )
    loader = DataLoader(ds, batch_size=64, layout="dense", sort_by_size=True)
    batches = list(loader)
    # take the largest same-shape run of batches as the template
    from notorch_tpu.data.batching import shape_signature

    by_sig: dict = {}
    for b in batches:
        by_sig.setdefault(shape_signature(b), []).append(b)
    template = max(by_sig.values(), key=len)
    print(f"template group: {len(template)} same-shape batches", flush=True)

    model = build_dmpnn(hidden_dim=256, depth=3)  # layout=auto -> dense_fused
    state = model.init(jax.random.PRNGKey(0), template[0])

    for k in ks:
        group = (template * ((k + len(template) - 1) // len(template)))[:k]
        if k == 1:
            # single-step dispatch path
            state, logs = model.train_step(state, group[0])
            float(logs["train/loss"])  # compile + sync
            n = reps // 2
            t0 = time.perf_counter()
            for _ in range(n):
                state, logs = model.train_step(state, group[0])
                float(logs["train/loss"])  # per-dispatch sync
            dt = time.perf_counter() - t0
            steps = n
        else:
            tree = stack_trees(group)
            state, logs = model.train_steps(state, tree)
            float(logs["train/loss"])
            n = max(2, int(reps / k))
            t0 = time.perf_counter()
            for _ in range(n):
                state, logs = model.train_steps(state, tree)
                float(logs["train/loss"])
            dt = time.perf_counter() - t0
            steps = n * k
        print(
            json.dumps(
                {"k": k, "steps_per_sec": round(steps / dt, 1),
                 "ms_per_step": round(1000 * dt / steps, 2)}
            ),
            flush=True,
        )
    assert np.isfinite(float(logs["train/loss"]))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
