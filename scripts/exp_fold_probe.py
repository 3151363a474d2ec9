"""Probe: does the Mosaic remote-compile helper accept byte changes to the
fused-block kernel family again? (Round-3 BASELINE note: at the end of the
previous session EVERY byte change SIGABRTed while the committed round-2
bytes still compiled — including a byte-equivalent reconstruction. A tunnel
restart may have cleared it.)

Two probes, tiny shapes (B=8, E=128, d=256, depth=3):
  recon  — reconstruction of the round-2 kernel (different module = new bytes)
  folded — the fold-rev kernel: A'[e,e'] = A[e,e'] & (e' != rev(e)), so the
           per-layer reverse-message subtraction out = A@mW - pair_swap(mW)
           becomes ONE matmul out = A'@mW (rev(e) = e^1 under the
           interleaved pair layout; the rev diagonal of A is 1 exactly on
           real pairs, so zeroing it deletes pair_swap(mW) exactly).

Each probe compiles, runs, and checks against a jnp oracle on real lanes.
Prints one line per probe: PROBE <name> ok rel=<err>  |  PROBE <name> FAIL.
"""

from __future__ import annotations

import os
import sys
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _arm_watchdog(seconds: int = 900) -> None:
    """LAST-RESORT safety timer. os._exit while a remote Mosaic compile or
    dispatch is still queued can wedge the tunneled TPU for ~45 min
    (CLAUDE.md hazard 3) — the watchdog exists for runs that would otherwise
    hang FOREVER (a hung remote compile holds no queued device work), where
    wedging is the lesser evil vs. a permanently stuck session. Prefer
    sizing probes to finish on their own; only the timer may call _exit."""
    import threading

    def die():
        print(f"watchdog: no completion within {seconds}s; aborting", flush=True)
        os._exit(3)

    t = threading.Timer(seconds, die)
    t.daemon = True
    t.start()


def make_data(B=8, E=128, d=256, depth=3, seed=0):
    rng = np.random.default_rng(seed)
    src = np.zeros((B, E), np.int32)
    dst = np.zeros((B, E), np.int32)
    emask = np.zeros((B, E), np.float32)
    for b in range(B):
        n_pairs = rng.integers(20, E // 2)
        for k in range(n_pairs):
            u, v = rng.integers(0, 60, 2)
            while v == u:
                v = rng.integers(0, 60)
            src[b, 2 * k], dst[b, 2 * k] = u, v
            src[b, 2 * k + 1], dst[b, 2 * k + 1] = v, u
            emask[b, 2 * k] = emask[b, 2 * k + 1] = 1.0
    h0 = rng.standard_normal((B, E, d)).astype(np.float32) * 0.3
    Ws = (rng.standard_normal((depth, d, d)) / np.sqrt(d)).astype(np.float32)
    bs = (rng.standard_normal((depth, d)) * 0.05).astype(np.float32)
    return h0, src, dst, emask, Ws, bs


def jnp_oracle(h0, src, dst, emask, Ws, bs, depth):
    import jax.numpy as jnp

    B, E, d = h0.shape
    A = ((src[:, :, None] == dst[:, None, :]) & (emask[:, None, :] > 0)).astype(
        np.float32
    )
    A = jnp.asarray(A)

    def pair_swap(x):
        p = x.reshape(B, E // 2, 2, d)
        return jnp.concatenate([p[:, :, 1:2], p[:, :, 0:1]], axis=2).reshape(x.shape)

    h = jnp.asarray(h0)
    for l in range(depth):
        m = jnp.maximum(h, 0.0)
        mW = jnp.einsum("bed,df->bef", m, Ws[l])
        h = h + jnp.einsum("bef,bfd->bed", A, mW) - pair_swap(mW) + bs[l][None, None, :]
    return h


def make_kernel(depth, tile, folded: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(src_ref, dst_ref, emask_ref, h_ref, w_ref, b_ref, out_ref):
        i = pl.program_id(0)
        h = h_ref[:]
        NB, E, d = h.shape
        row0 = i * tile
        src = src_ref[pl.ds(row0, NB), :]
        dst = dst_ref[pl.ds(row0, NB), :]
        emask = emask_ref[pl.ds(row0, NB), :]
        mask_ok = emask.astype(jnp.float32) > 0.0
        keep = (src[:, :, None] == dst[:, None, :]) & mask_ok[:, None, :]
        if folded:
            e_i = jax.lax.broadcasted_iota(jnp.int32, (NB, E, E), 1)
            e_j = jax.lax.broadcasted_iota(jnp.int32, (NB, E, E), 2)
            rev_i = e_i + 1 - 2 * (e_i % 2)
            keep = keep & (e_j != rev_i)
        A = jnp.where(keep, 1.0, 0.0).astype(h.dtype)

        def pair_swap(x):
            p = x.reshape(NB, E // 2, 2, d)
            sw = jnp.concatenate([p[:, :, 1:2, :], p[:, :, 0:1, :]], axis=2)
            return sw.reshape(NB, E, d)

        for li in range(depth):
            m = jnp.maximum(h, 0.0)
            mW = jax.lax.dot_general(
                m.reshape(NB * E, d), w_ref[li], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(h.dtype).reshape(NB, E, d)
            out = jax.lax.dot_general(
                A, mW, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(h.dtype)
            if not folded:
                out = out - pair_swap(mW)
            h = h + out + b_ref[li][None, None, :]
        out_ref[:] = h

    return kernel


def run_probe(name, folded, h0, src, dst, emask, Ws, bs, depth, tile):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    B, E, d = h0.shape
    kernel = make_kernel(depth, tile, folded)
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    try:
        out = pl.pallas_call(
            kernel,
            grid=(B // tile,),
            in_specs=[
                whole((B, E)), whole((B, E)), whole((B, E)),
                pl.BlockSpec((tile, E, d), lambda i: (i, 0, 0)),
                whole(tuple(Ws.shape)), whole(tuple(bs.shape)),
            ],
            out_specs=pl.BlockSpec((tile, E, d), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, E, d), jnp.float32),
        )(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(emask),
          jnp.asarray(h0), jnp.asarray(Ws), jnp.asarray(bs))
        ref = jnp_oracle(h0, src, dst, emask, Ws, bs, depth)
        mask = jnp.asarray(emask)[:, :, None]
        num = float(jnp.linalg.norm((out - ref) * mask))
        den = float(jnp.linalg.norm(ref * mask)) + 1e-30
        print(f"PROBE {name} ok rel={num / den:.3e}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"PROBE {name} FAIL: {type(e).__name__}: {str(e)[:300]}", flush=True)
        traceback.print_exc(limit=3)
        return False


def main():
    _arm_watchdog()
    import jax

    print("devices:", jax.devices(), flush=True)
    depth, tile = 3, 8
    h0, src, dst, emask, Ws, bs = make_data(depth=depth)
    run_probe("recon", False, h0, src, dst, emask, Ws, bs, depth, tile)
    run_probe("folded", True, h0, src, dst, emask, Ws, bs, depth, tile)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
