"""End-to-end SERVING throughput on the chip: `notorch-tpu-predict`'s exact
path (featurize CSV -> packed batches -> jitted predict -> denormalize)
measured as molecules/second, plus the cross-process cold-start story.

Phases (each its OWN process, run strictly sequentially — the orchestrator
never imports jax, so exactly one process talks to the TPU at a time):

  train        — 1-epoch checkpoint (meta + transforms = production artifacts)
  cold_first   — fresh process, EMPTY persistent compile cache (populates it)
  cold_cached  — fresh process, warm persistent cache (the round-5
                 deliverable: a restarted server skips every bucket-shape
                 recompile via jax_compilation_cache_dir — utils.
                 enable_compilation_cache, on by default in the CLIs)
  warm         — two predicts in one process; reports the second (in-memory
                 compile cache — the long-lived-server regime)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CSV = os.path.join(REPO, "tests", "data", "lipo.csv")


def phase_train(tmp, cache_dir):
    sys.path.insert(0, REPO)
    from bench import _arm_watchdog

    _arm_watchdog(3000)
    from notorch_tpu.cli.train import apply_overrides, load_config, run

    cfg = load_config(os.path.join(REPO, "configs", "dmpnn_regression.yaml"))
    apply_overrides(cfg, [
        "trainer.epochs=1",
        "trainer.batch_size=64",
        "model.hidden_dim=256",
        "model.depth=3",
        f"trainer.checkpoint_dir={tmp}/ckpt",
        f"trainer.compilation_cache={cache_dir}",
    ])
    run(cfg)


def phase_predict(tmp, n_runs: int):
    sys.path.insert(0, REPO)
    from bench import _arm_watchdog

    _arm_watchdog(3000)
    from notorch_tpu.cli.predict import run_predict

    elapsed = []
    for i in range(n_runs):
        t0 = time.perf_counter()
        run_predict(f"{tmp}/ckpt", CSV, out=f"{tmp}/preds_{i}.csv", batch_size=256)
        elapsed.append(time.perf_counter() - t0)
    print("ELAPSED " + " ".join(f"{t:.3f}" for t in elapsed), flush=True)


def _run_phase(args, cache_dir):
    env = dict(os.environ, NOTORCH_TPU_COMPILATION_CACHE=cache_dir)
    res = subprocess.run(
        [sys.executable, os.path.abspath(__file__)] + args,
        env=env, capture_output=True, text=True,
    )
    if res.returncode != 0:
        raise RuntimeError(f"phase {args} failed:\n{res.stderr[-3000:]}")
    for line in res.stdout.splitlines():
        if line.startswith("ELAPSED"):
            return [float(x) for x in line.split()[1:]]
    return []


def main():
    import pandas as pd

    tmp = tempfile.mkdtemp()
    cache_dir = os.path.join(tmp, "xla_cache")
    n = len(pd.read_csv(CSV))

    _run_phase(["--phase", "train", "--tmp", tmp], cache_dir)
    shutil.rmtree(cache_dir, ignore_errors=True)  # true worst-case cold start
    (cold_first,) = _run_phase(["--phase", "predict", "--tmp", tmp, "--runs", "1"],
                               cache_dir)
    (cold_cached,) = _run_phase(["--phase", "predict", "--tmp", tmp, "--runs", "1"],
                                cache_dir)
    _, warm = _run_phase(["--phase", "predict", "--tmp", tmp, "--runs", "2"],
                         cache_dir)

    print(json.dumps({
        "n_molecules": n,
        "cold_first_s": round(cold_first, 2),
        "cold_cached_s": round(cold_cached, 2),
        "warm_s": round(warm, 2),
        "cold_cached_over_warm": round(cold_cached / warm, 2),
        "warm_mols_per_sec": round(n / warm, 1),
        "cold_cached_mols_per_sec": round(n / cold_cached, 1),
        "cache_entries": len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else 0,
    }))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="main")
    ap.add_argument("--tmp", default=None)
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()
    if args.phase == "train":
        phase_train(args.tmp, os.environ.get("NOTORCH_TPU_COMPILATION_CACHE"))
    elif args.phase == "predict":
        phase_predict(args.tmp, args.runs)
    else:
        main()
