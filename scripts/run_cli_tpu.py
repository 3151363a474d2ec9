"""End-to-end production CLI validation on the chip.

Runs the REAL user workflow as subprocesses, with defaults (layout="auto" —
the fused Pallas dense block is the training path):

1. ``notorch-tpu-train configs/dmpnn_regression.yaml`` (3 epochs, prefetch,
   checkpointing, test-split eval) into a temp workdir;
2. ``notorch-tpu-predict <ckpt> tests/data/lipo.csv`` from the written
   checkpoint, asserting row-aligned denormalized predictions.

Prints one JSON line per stage with wall times and the per-epoch seconds
parsed from the train log. Subprocesses are TPU-attached: they are sized to
complete on their own and are NOT killed on timeout (killing a TPU-attached
process wedges the device ~45 min) — the watchdog only marks failure.

Run:  python scripts/run_cli_tpu.py > out 2>&1 &
"""

from __future__ import annotations

import csv
import json
import os
import subprocess
import sys
import tempfile
import time


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    work = tempfile.mkdtemp(prefix="notorch_cli_")
    ckpt = os.path.join(work, "ckpt")

    t0 = time.perf_counter()
    train = subprocess.run(
        [
            sys.executable, "-m", "notorch_tpu.cli.train",
            os.path.join(repo, "configs", "dmpnn_regression.yaml"),
            "trainer.epochs=3",
            f"trainer.checkpoint_dir={ckpt}",
        ],
        cwd=repo, capture_output=True, text=True,
    )
    train_s = time.perf_counter() - t0
    sys.stderr.write(train.stdout[-4000:] + train.stderr[-4000:])
    if train.returncode != 0:
        print(json.dumps({"stage": "train", "ok": False, "rc": train.returncode}))
        sys.exit(1)
    epochs = []  # the CLI prints one JSON record per epoch to stdout
    for line in train.stdout.splitlines():
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "time" in rec:
            epochs.append(round(rec["time"], 2))
    print(
        json.dumps(
            {"stage": "train", "ok": True, "wall_seconds": round(train_s, 1),
             "epoch_seconds": epochs}
        ),
        flush=True,
    )

    out_csv = os.path.join(work, "preds.csv")
    t0 = time.perf_counter()
    pred = subprocess.run(
        [
            sys.executable, "-m", "notorch_tpu.cli.predict",
            ckpt, os.path.join(repo, "tests", "data", "lipo.csv"),
            "-o", out_csv,
        ],
        cwd=repo, capture_output=True, text=True,
    )
    pred_s = time.perf_counter() - t0
    sys.stderr.write(pred.stdout[-2000:] + pred.stderr[-2000:])
    if pred.returncode != 0:
        print(json.dumps({"stage": "predict", "ok": False, "rc": pred.returncode}))
        sys.exit(1)
    with open(out_csv) as f:
        rows = list(csv.DictReader(f))
    with open(os.path.join(repo, "tests", "data", "lipo.csv")) as f:
        n_in = sum(1 for _ in csv.DictReader(f))
    ok = len(rows) == n_in
    print(
        json.dumps(
            {"stage": "predict", "ok": ok, "wall_seconds": round(pred_s, 1),
             "rows": len(rows), "expected": n_in,
             "first_pred": rows[0] if rows else None}
        ),
        flush=True,
    )
    print("DONE", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
