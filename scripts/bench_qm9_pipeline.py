"""Pipeline benchmark at QM9 scale (config 3 shape): 134k molecules, 12
regression targets — featurization throughput, epoch wall time, and the
number of distinct compiled shapes the bucketing ladder produces.

Real QM9 CSVs are not obtainable in this environment (zero egress; see
BASELINE.md), so the molecule stream is the committed 100-SMILES fixture
cycled to 134k rows with synthetic targets — the point is the PIPELINE
(host featurization, bucketed padding, compile-count control), which
depends on molecule sizes and row count, not on target values.

Runs on host CPU by default (``--tpu`` to run the epoch on the chip).

Run:  python scripts/bench_qm9_pipeline.py > out 2>&1 &
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--tpu", action="store_true", help="run the epoch on TPU")
    parser.add_argument("--n", type=int, default=134_000)
    args = parser.parse_args()

    import jax

    if not args.tpu:
        # the axon TPU plugin ignores JAX_PLATFORMS from the environment;
        # this is the only reliable way to force CPU
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from notorch_tpu.data.batching import DataLoader, shape_signature
    from notorch_tpu.data.dataset import MolecularDataset, TargetSpec, TransformManager
    from notorch_tpu.models.dmpnn import build_dmpnn
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    print("devices:", jax.devices(), flush=True)

    path = os.path.join(os.path.dirname(__file__), "..", "tests", "data", "smis.csv")
    with open(path) as f:
        base = [row["smiles"] for row in csv.DictReader(f)]
    n = args.n
    smis = [base[i % len(base)] for i in range(n)]
    rng = np.random.default_rng(0)
    ycols = {f"y{i}": rng.normal(size=n).tolist() for i in range(12)}

    from notorch_tpu import native

    if native.available():  # C++ featurizer (~34k mol/s, 17x Python)
        transform = native.NativeSmiToGraph()
        print("featurizer: native C++", flush=True)
    else:
        transform = Pipeline(SmiToMol(), MolToGraph())
        print("featurizer: python fallback", flush=True)
    ds = MolecularDataset(
        {"smiles": smis, **ycols},
        transforms={"graph": TransformManager(transform, in_key="smiles")},
        targets={"y": TargetSpec(columns=list(ycols), task="regression")},
    )

    # featurization throughput (cold, pure host)
    t0 = time.perf_counter()
    loader = DataLoader(ds, batch_size=512, layout="dense", sort_by_size=True)
    for i in range(n):
        loader._fetch(i)
    feat_s = time.perf_counter() - t0
    print(
        json.dumps(
            {"name": "featurization", "mols": n, "seconds": round(feat_s, 1),
             "mols_per_sec": round(n / feat_s)}
        ),
        flush=True,
    )

    model = build_dmpnn(num_tasks=12, hidden_dim=256, depth=3, target_key="targets.y")
    batch0 = next(iter(loader))
    state = model.init(jax.random.PRNGKey(0), batch0)

    shapes = set()
    t0 = time.perf_counter()
    for batch in loader:
        shapes.add(shape_signature(batch))
        state, logs = model.train_step(state, batch)
    loss = float(logs["train/loss"])
    epoch_s = time.perf_counter() - t0
    print(
        json.dumps(
            {"name": "epoch", "seconds": round(epoch_s, 1),
             "compiled_shapes": len(shapes), "final_loss": round(loss, 4)}
        ),
        flush=True,
    )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
