"""Bisect the Mosaic ApplyVectorLayoutPass SIGABRT (Check failed:
limits[i] <= dim(i) (16 vs. 1) in vector_extract_slice) hit by the folded
stash kernel under jax.default_matmul_precision("highest").

Matrix: {stash, plain} x {folded-3d-iota A} x {default, highest} precision
at the bench parity-gate shapes (B=12, tile=4, E=128, d=256, depth=3),
plus a 2D-iota fold build as an alternate construction. Each attempt is
caught; one PROBE line each.
"""

from __future__ import annotations

import os
import sys
import threading

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _arm_watchdog(seconds: int = 1200) -> None:
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


def main():
    _arm_watchdog()
    import jax
    import jax.numpy as jnp

    import notorch_tpu.kernels.dense_mpnn as dm

    print("devices:", jax.devices(), flush=True)

    B, E, d, depth, tile = 12, 128, 256, 3, 4
    rng = np.random.default_rng(0)
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
    src, dst, emask = jnp.asarray(src), jnp.asarray(dst), jnp.asarray(emask)

    fold3d = dm._edge_adjacency

    def fold2d(s, dd, em, mm):
        mask_ok = em.astype(jnp.float32) > 0.0
        e_i = jax.lax.broadcasted_iota(jnp.int32, (E, E), 0)
        e_j = jax.lax.broadcasted_iota(jnp.int32, (E, E), 1)
        rev_i = e_i + 1 - 2 * (e_i % 2)
        notrev = (e_j != rev_i)[None, :, :]
        keep = (s[:, :, None] == dd[:, None, :]) & mask_ok[:, None, :] & notrev
        return jnp.where(keep, 1.0, 0.0).astype(mm)

    def unfolded(s, dd, em, mm):
        mask_ok = em.astype(jnp.float32) > 0.0
        return jnp.where(
            (s[:, :, None] == dd[:, None, :]) & mask_ok[:, None, :], 1.0, 0.0
        ).astype(mm)

    def attempt(name, adjacency, stash, precision):
        dm._edge_adjacency = adjacency
        jax.clear_caches()  # the monkeypatched global is invisible to jit's cache key
        try:
            ctx = jax.default_matmul_precision(precision)
            with ctx:
                if stash:
                    out, hs = dm.fused_dense_mpnn_block_stash(
                        h0, src, dst, emask, Ws, bs,
                        depth=depth, n_nodes=72, residual=True, mols_per_tile=tile,
                    )
                    s = float(jnp.sum(out) + jnp.sum(hs))
                else:
                    out = dm.fused_dense_mpnn_block(
                        h0, src, dst, emask, Ws, bs,
                        depth=depth, n_nodes=72, residual=True, mols_per_tile=tile,
                    )
                    s = float(jnp.sum(out))
            print(f"PROBE {name} ok sum={s:.4f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"PROBE {name} FAIL {type(e).__name__}: {str(e)[:150]}", flush=True)
        finally:
            dm._edge_adjacency = fold3d

    attempt("plain_fold3d_default", fold3d, False, "default")
    attempt("plain_fold3d_highest", fold3d, False, "highest")
    attempt("stash_fold3d_default", fold3d, True, "default")
    attempt("stash_fold3d_highest", fold3d, True, "highest")
    attempt("stash_fold2d_highest", fold2d, True, "highest")
    attempt("stash_unfolded_highest", unfolded, True, "highest")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
