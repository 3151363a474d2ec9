"""TPU benchmark: the isolated E->V segment reduce — tile-packed CSR Pallas
kernel vs XLA ``segment_sum``.

Synthetic topology V=8192, E=32768, d=256 (uniform random dst), matching the
round-1 measurement (140.8M vs 92.7M edge-ops/s, 1.52x, on v5e). Exactness
vs segment_sum is asserted before timing (rel tolerance for the TPU's bf16
multiply passes).

One JSON line per variant. Sized to complete on its own — NEVER kill a
TPU-attached process.

Run:  python scripts/bench_packed_csr.py > out 2>&1 &
"""

from __future__ import annotations

import json
import os
import threading
import time


def _arm_watchdog(seconds: int = 1800) -> None:
    def die():
        print(f"watchdog: no completion within {seconds}s; aborting", flush=True)
        os._exit(3)

    t = threading.Timer(seconds, die)
    t.daemon = True
    t.start()


def _measure(run_scalar, target_seconds: float = 1.5):
    probe = run_scalar(10)
    float(probe())
    t0 = time.perf_counter()
    float(probe())
    dt10 = time.perf_counter() - t0
    chain = max(20, min(5000, int(target_seconds / max(dt10 / 10, 1e-5))))
    run = run_scalar(chain)
    float(run())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run())
        best = min(best, time.perf_counter() - t0)
    return best, chain


def main() -> None:
    _arm_watchdog()
    import sys

    import jax

    interpret = "--cpu" in sys.argv
    if interpret:  # smoke-test mode (the axon TPU plugin ignores
        jax.config.update("jax_platforms", "cpu")  # JAX_PLATFORMS from env)
    import jax.numpy as jnp
    import numpy as np

    from notorch_tpu.kernels.csr_segment import (
        csr_segment_sum_packed,
        pack_edges_by_tile,
    )

    print("devices:", jax.devices(), flush=True)

    V, E, d = 8192, 32768, 256
    rng = np.random.default_rng(0)
    dst = np.sort(rng.integers(0, V, size=E)).astype(np.int32)
    data = rng.normal(size=(E, d)).astype(np.float32)
    perm, packed_dst, budget = pack_edges_by_tile(dst, V, tile_v=128)
    print(f"packed budget per 128-node tile: {budget}", flush=True)

    data_j = jnp.asarray(data)
    dst_j = jnp.asarray(dst)
    perm_j = jnp.asarray(perm)
    pdst_j = jnp.asarray(packed_dst)

    ref = jax.ops.segment_sum(data_j, dst_j, num_segments=V)
    out = csr_segment_sum_packed(data_j, perm_j, pdst_j, V, interpret=interpret)
    rel = float(jnp.abs(out - ref).max() / jnp.abs(ref).max())
    if rel > 5e-3:
        raise RuntimeError(f"packed CSR mismatch: rel={rel}")
    print(json.dumps({"check": "exactness", "rel_err": rel}), flush=True)

    def make_xla(chain):
        @jax.jit
        def run(data):
            def body(_, x):
                out = jax.ops.segment_sum(x, dst_j, num_segments=V)
                return x + out[dst_j] * 1e-6  # feed back, keep shape [E, d]

            return jnp.sum(jax.lax.fori_loop(0, chain, body, data))

        return lambda: run(data_j)

    def make_packed(chain):
        @jax.jit
        def run(data):
            def body(_, x):
                out = csr_segment_sum_packed(x, perm_j, pdst_j, V, interpret=interpret)
                return x + out[dst_j] * 1e-6

            return jnp.sum(jax.lax.fori_loop(0, chain, body, data))

        return lambda: run(data_j)

    for name, make in (("xla_segment_sum", make_xla), ("csr_packed", make_packed)):
        best, chain = _measure(make)
        eps = E * chain / best
        print(
            json.dumps({"name": name, "edge_ops_per_sec": round(eps)}), flush=True
        )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
