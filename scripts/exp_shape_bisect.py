"""Confirm the Mosaic SIGABRT is SHAPE-dependent, not byte-dependent:
sweep (B, tile) for the plain and stash fused kernels at E=128, d=256,
depth=3, default precision. Round-2's committed usage (tile 8) compiles;
the bench parity gate (tile 4) crashes ApplyVectorLayoutPass.
"""

from __future__ import annotations

import os
import sys
import threading

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _arm_watchdog(seconds: int = 1500) -> None:
    """LAST-RESORT safety timer. os._exit while a remote Mosaic compile or
    dispatch is still queued can wedge the tunneled TPU for ~45 min
    (CLAUDE.md hazard 3) — the watchdog exists for runs that would otherwise
    hang FOREVER (a hung remote compile holds no queued device work), where
    wedging is the lesser evil vs. a permanently stuck session. Prefer
    sizing probes to finish on their own; only the timer may call _exit."""
    def die():
        print(f"watchdog: abort after {seconds}s", flush=True)
        os._exit(3)

    t = threading.Timer(seconds, die)
    t.daemon = True
    t.start()


def make_data(B, E, d, depth, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    src = np.zeros((B, E), np.int32)
    dst = np.zeros((B, E), np.int32)
    emask = np.zeros((B, E), bool)
    for b in range(B):
        for k in range(rng.integers(20, E // 2)):
            u, v = rng.integers(0, 60, 2)
            if v == u:
                v = (u + 1) % 60
            src[b, 2 * k], dst[b, 2 * k] = u, v
            src[b, 2 * k + 1], dst[b, 2 * k + 1] = v, u
            emask[b, 2 * k] = emask[b, 2 * k + 1] = True
    h0 = jnp.asarray(rng.standard_normal((B, E, d)).astype(np.float32) * 0.3)
    Ws = jnp.asarray((rng.standard_normal((depth, d, d)) / 16).astype(np.float32))
    bs = jnp.asarray((rng.standard_normal((depth, d)) * 0.05).astype(np.float32))
    return h0, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(emask), Ws, bs


def main():
    _arm_watchdog()
    import jax
    import jax.numpy as jnp

    import notorch_tpu.kernels.dense_mpnn as dm

    print("devices:", jax.devices(), flush=True)
    E, d, depth = 128, 256, 3

    def attempt(kind, B, tile):
        h0, src, dst, emask, Ws, bs = make_data(B, E, d, depth)
        try:
            if kind == "stash":
                out, hs = dm.fused_dense_mpnn_block_stash(
                    h0, src, dst, emask, Ws, bs,
                    depth=depth, n_nodes=72, residual=True, mols_per_tile=tile,
                )
                s = float(jnp.sum(out))
            else:
                out = dm.fused_dense_mpnn_block(
                    h0, src, dst, emask, Ws, bs,
                    depth=depth, n_nodes=72, residual=True, mols_per_tile=tile,
                )
                s = float(jnp.sum(out))
            print(f"PROBE {kind} B={B} tile={tile} ok sum={s:.3f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"PROBE {kind} B={B} tile={tile} FAIL {str(e)[:90]}", flush=True)

    for kind in ("plain", "stash"):
        attempt(kind, 8, 8)
        attempt(kind, 16, 8)
        attempt(kind, 8, 4)
        attempt(kind, 8, 2)
        attempt(kind, 12, 4)
        attempt(kind, 16, 16)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
