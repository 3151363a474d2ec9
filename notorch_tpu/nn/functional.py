"""Small functional ops.

Capability parity: reference ``notorch/nn/functional.py`` — the multilinear
inner product (MIP): elementwise product over a set of vectors, summed over
the feature axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def multilinear_inner_product(*tensors: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    out = tensors[0]
    for t in tensors[1:]:
        out = out * t
    return out.sum(axis=axis)


MIP = multilinear_inner_product
