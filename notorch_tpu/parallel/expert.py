"""Expert parallelism for MixtureOfExperts via GSPMD param sharding.

The reference MoE is dense and single-device (every expert runs on every
token, SURVEY §2.2) — expert parallelism is a new, TPU-native component.
:class:`~notorch_tpu.nn.moe.MixtureOfExperts` stacks expert parameters along
a leading axis (``nn.vmap``), so EP is pure sharding: place that axis on an
``expert`` mesh axis and XLA partitions the batched expert matmuls across
devices, inserting an all-reduce for the router-weighted combine
(``einsum("ne,end->nd")`` contracts the expert axis). Tokens ride a ``data``
axis orthogonally. No dispatch code, no capacity factors, exact gradients —
collectives ride ICI exactly where the scaling-book recipe puts them.

Usage::

    mesh = make_mesh({"data": 2, "expert": 4})
    specs = expert_partition_specs(params, mesh)     # pytree of NamedSharding
    params = jax.device_put(params, specs)           # shard the expert stacks
    step = jax.jit(train_step, ...)                   # GSPMD does the rest
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["expert_partition_specs", "shard_expert_params"]


def expert_partition_specs(
    params,
    mesh: Mesh,
    axis: str = "expert",
    expert_collection: str = "experts",
):
    """A pytree of :class:`NamedSharding` matching ``params``: every leaf
    under a module collection named ``expert_collection`` (the stacked
    ``nn.vmap`` expert axis, :class:`MixtureOfExperts`) is sharded along its
    leading dimension over ``axis``; every other leaf is replicated.
    """
    n_shards = mesh.shape[axis]

    def spec_for(path, leaf) -> NamedSharding:
        in_experts = any(
            getattr(k, "key", None) == expert_collection for k in path
        )
        if in_experts and leaf.ndim >= 1 and leaf.shape[0] % n_shards == 0:
            return NamedSharding(mesh, P(axis, *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_expert_params(
    params,
    mesh: Mesh,
    axis: str = "expert",
    expert_collection: str = "experts",
):
    """``device_put`` the params with :func:`expert_partition_specs` so a
    subsequent ``jax.jit`` step is expert-parallel with no further
    annotation."""
    return jax.device_put(
        params, expert_partition_specs(params, mesh, axis, expert_collection)
    )
