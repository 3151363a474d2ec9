"""GVP train-gap ablation: train measures 15.5M interactions/s vs 62M fwd
(ratio 4.0x where fwd+bwd flops-par is ~3x). Candidate culprit: the
neighbor-gather VJP (a scatter-add over N*K indices, twice per conv).

Variants (same clouds/dims as bench_spatial.bench_gvp):
  1. baseline            — x[nbrs] (autodiff scatter-add backward)
  2. stop_grad_gather    — stop_gradient around the gathers: semantically
                           WRONG (timing bound only) — if train jumps, the
                           scatter is the wall; if not, it's GVP-chain flops
  3. segsum_bwd          — custom VJP routing the backward through
                           jax.ops.segment_sum (sorted-id lowering)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _arm_watchdog  # noqa: E402


def main():
    import functools

    import jax

    _arm_watchdog(3000)
    import jax.numpy as jnp

    import bench_spatial
    from notorch_tpu.nn.spatial import gvp as gvp_mod

    baseline_take = gvp_mod._nbr_take

    def stop_grad_take(x, nbrs):
        return jax.lax.stop_gradient(x)[nbrs]

    @functools.partial(jax.custom_vjp, nondiff_argnums=())
    def segsum_take(x, nbrs):
        return x[nbrs]

    def _fwd(x, nbrs):
        return x[nbrs], (nbrs, x.shape[0])

    def _bwd(res, g):
        nbrs, N = res
        flat = g.reshape((nbrs.size,) + g.shape[2:])
        gx = jax.ops.segment_sum(flat, nbrs.reshape(-1), num_segments=N)
        return gx, None

    segsum_take.defvjp(_fwd, _bwd)

    @functools.partial(jax.custom_vjp, nondiff_argnums=())
    def sorted_segsum_take(x, nbrs):
        return x[nbrs]

    def _sfwd(x, nbrs):
        return x[nbrs], (nbrs, x.shape[0])

    def _sbwd(res, g):
        nbrs, N = res
        flat = g.reshape((nbrs.size,) + g.shape[2:])
        ids = nbrs.reshape(-1)
        order = jnp.argsort(ids)
        gx = jax.ops.segment_sum(
            flat[order], ids[order], num_segments=N, indices_are_sorted=True
        )
        return gx, None

    sorted_segsum_take.defvjp(_sfwd, _sbwd)

    @functools.partial(jax.custom_vjp, nondiff_argnums=())
    def onehot_take(x, nbrs):
        return x[nbrs]

    def _ofwd(x, nbrs):
        return x[nbrs], (nbrs, x.shape[0])

    def _obwd(res, g):
        # block the contraction: for each source node i, O[i, k, w] =
        # [nbrs[i, k] == i - W + w] over a relative window of 2W+1 targets
        # (neighbors are spatially local after cloud concatenation when the
        # search is banded; for the UNBANDED default this is exact only if
        # all neighbor offsets fit the window — checked and widened).
        # Fallback: plain one-hot matmul in N-chunks.
        nbrs, N = res
        flat = g.reshape((nbrs.size,) + g.shape[2:])
        flat2 = flat.reshape(nbrs.size, -1)
        C = flat2.shape[-1]
        ids = nbrs.reshape(-1)
        chunk = 512
        parts = []
        for n0 in range(0, N, chunk):
            onehot = (ids[:, None] == (n0 + jnp.arange(chunk))[None, :]).astype(
                flat2.dtype
            )  # [NK, chunk]
            parts.append(
                jax.lax.dot_general(
                    onehot, flat2, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(flat2.dtype)
            )
        gx = jnp.concatenate(parts, axis=0)[:N]
        return gx.reshape((N,) + flat.shape[1:]), None

    onehot_take.defvjp(_ofwd, _obwd)

    for tag, fn in [
        ("baseline", baseline_take),
        ("stop_grad_gather", stop_grad_take),
        ("segsum_bwd", segsum_take),
        ("sorted_segsum_bwd", sorted_segsum_take),
        ("onehot_chunk_bwd", onehot_take),
    ]:
        gvp_mod._nbr_take = fn
        try:
            out = bench_spatial.bench_gvp()
            out["variant"] = tag
            print(json.dumps(out), flush=True)
        except Exception as e:
            print(json.dumps({"variant": tag,
                              "error": f"{type(e).__name__}: {e}"[:250]}),
                  flush=True)
        finally:
            gvp_mod._nbr_take = baseline_take


if __name__ == "__main__":
    main()
