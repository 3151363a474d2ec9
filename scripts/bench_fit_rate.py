"""TPU benchmark: REAL ``fit()`` throughput — fresh lipo batches every step.

This is the end-to-end number (featurize -> pad -> transfer -> jitted train
step with deferred log sync), not a device-compute ceiling: on the tunneled
chip it is dominated by dispatch/transfer latency, which PrefetchLoader
overlaps. Measures steps/s for a grid of pipeline configs:

- plain DataLoader (no prefetch) — the naive baseline
- PrefetchLoader (async device_put in the producer thread)
- PrefetchLoader(stack=8) + steps_per_dispatch (producer-side stacked groups)

One JSON line per config. Epoch 0 is warmup (featurization + compiles);
epoch 1+ is timed. Sized to complete on its own — NEVER kill a TPU-attached
process.

Run:  python scripts/bench_fit_rate.py > out 2>&1 &
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
    limit = None
    for a in sys.argv[1:]:
        if a.startswith("--limit="):
            limit = int(a.split("=")[1])

    from notorch_tpu.data.batching import DataLoader, PrefetchLoader
    from notorch_tpu.data.dataset import MolecularDataset, TargetSpec, TransformManager
    from notorch_tpu.models.dmpnn import build_dmpnn
    from notorch_tpu.training.loop import fit
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    print("devices:", jax.devices(), flush=True)

    path = os.path.join(os.path.dirname(__file__), "..", "tests", "data", "lipo.csv")
    with open(path) as f:
        rows = list(csv.DictReader(f))[:limit]
    smis = [r["smiles"] for r in rows]
    ys = [float(r["lipo"]) for r in rows]

    ds = MolecularDataset(
        {"smiles": smis, "y": ys},
        transforms={
            "graph": TransformManager(Pipeline(SmiToMol(), MolToGraph()), in_key="smiles")
        },
        targets={"y": TargetSpec(columns=["y"], task="regression")},
    )

    def run(name: str, make_loader, steps_per_dispatch: int = 1, epochs: int = 3):
        loader = make_loader()
        model = build_dmpnn(hidden_dim=256, depth=3)  # layout=auto -> dense_fused
        batch0 = next(iter(loader))  # Model.init unwraps StackedBatch items
        state = model.init(jax.random.PRNGKey(0), batch0)
        result = fit(
            model, state, loader, epochs=epochs,
            steps_per_dispatch=steps_per_dispatch,
        )
        # epoch 0 includes featurization+compilation; steady state = later epochs
        times = [rec["time"] for rec in result.history]
        n_steps = len(loader)
        steady = min(times[1:]) if len(times) > 1 else times[0]
        out = {
            "name": name,
            "steps_per_sec": round(n_steps / steady, 1),
            "epoch_seconds": [round(t, 2) for t in times],
            "n_steps_per_epoch": n_steps,
            "final_train_loss": round(result.history[-1].get("train/loss", -1), 4),
        }
        print(json.dumps(out), flush=True)
        return out

    dl = lambda: DataLoader(ds, batch_size=64, shuffle=True, layout="dense",
                            sort_by_size=True)
    run("plain_loader_k1", dl)
    run("prefetch_k1", lambda: PrefetchLoader(dl(), buffer_size=4))
    run(
        "prefetch_stack8",
        lambda: PrefetchLoader(dl(), buffer_size=4, stack=8),
        steps_per_dispatch=8,
    )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
