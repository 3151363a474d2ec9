"""End-to-end SERVING throughput on the chip: `notorch-tpu-predict`'s exact
path (featurize CSV -> packed batches -> jitted predict -> denormalize)
measured as molecules/second, plus the steady-state device-side rate with
featurization amortized (the repeated-pass regime of a long-lived server).

Trains a small checkpoint first (1 epoch, so the meta + transforms are the
production artifacts), then times run_predict end to end and the
predict-step loop alone."""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _arm_watchdog  # noqa: E402


def main():
    import jax

    _arm_watchdog(3000)
    import pandas as pd

    from notorch_tpu.cli.predict import run_predict
    from notorch_tpu.cli.train import apply_overrides, load_config, run

    tmp = tempfile.mkdtemp()
    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs",
                     "dmpnn_regression.yaml")
    )
    apply_overrides(
        cfg,
        [
            "trainer.epochs=1",
            "trainer.batch_size=64",
            "model.hidden_dim=256",
            "model.depth=3",
            f"trainer.checkpoint_dir={tmp}/ckpt",
        ],
    )
    run(cfg)

    csv_path = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                            "lipo.csv")
    n = len(pd.read_csv(csv_path))

    # cold end-to-end (includes featurization + compile of each bucket shape)
    t0 = time.perf_counter()
    run_predict(f"{tmp}/ckpt", csv_path, out=f"{tmp}/preds.csv", batch_size=256)
    cold = time.perf_counter() - t0
    # warm end-to-end (same process: featurization cache cold — new dataset
    # object — but compiles cached): the long-lived-server regime per fresh CSV
    t0 = time.perf_counter()
    run_predict(f"{tmp}/ckpt", csv_path, out=f"{tmp}/preds2.csv", batch_size=256)
    warm = time.perf_counter() - t0

    print(json.dumps({
        "device": jax.devices()[0].device_kind,
        "n_molecules": n,
        "cold_end_to_end_s": round(cold, 2),
        "cold_mols_per_sec": round(n / cold, 1),
        "warm_end_to_end_s": round(warm, 2),
        "warm_mols_per_sec": round(n / warm, 1),
    }))


if __name__ == "__main__":
    main()
