"""Sharded data loading for SPMD training.

Builds stacked ``[n_data, n_edge_shards, ...]`` batches (see
``parallel/partition.py``) straight from a dataset: the global batch is cut
into per-device-group molecule lists, padded to SHARED caps (one compiled
shape across the mesh), and edge-sharded. With multiple hosts each host
builds only its slice of the data axis.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from notorch_tpu.data.batching import bucket_ladder, round_up_ladder
from notorch_tpu.data.samplers import SeededSampler, SequentialSampler
from notorch_tpu.parallel.partition import build_spmd_batch


class ShardedDataLoader:
    """Yield SPMD-stacked batches over a :class:`MolecularDataset`.

    ``n_data`` local data shards x ``n_edge_shards`` edge shards; global
    batch size = ``n_data * per_shard_graphs``.
    """

    def __init__(
        self,
        dataset,
        n_data: int,
        per_shard_graphs: int,
        n_edge_shards: int = 1,
        shuffle: bool = False,
        seed: int = 0,
        node_quantum: int = 128,
        edge_quantum: int = 256,
        target_name: str | None = None,
    ):
        self.dataset = dataset
        self.n_data = n_data
        self.per = per_shard_graphs
        self.n_edge_shards = n_edge_shards
        self.global_batch = n_data * per_shard_graphs
        self.sampler = (
            SeededSampler(len(dataset), seed) if shuffle else SequentialSampler(len(dataset))
        )
        self.node_ladder = bucket_ladder(node_quantum, 1 << 22)
        self.edge_ladder = bucket_ladder(edge_quantum, 1 << 23)
        names = list(dataset.targets)
        self.target_name = target_name or (names[0] if names else None)
        self._cache: dict[int, object] = {}

    def _graph(self, idx: int):
        hit = self._cache.get(idx)
        if hit is None:
            sample = self.dataset[idx]
            mgr = next(iter(self.dataset.transforms.values()))
            hit = sample[mgr.out_key]
            self._cache[idx] = hit
        return hit

    def set_epoch(self, epoch: int) -> None:
        """Epoch-keyed shuffle order (pure function of (seed, epoch)) — lets
        ``fit(resume=True)`` fast-forward an interrupted epoch exactly, the
        same contract as the single-chip ``DataLoader``."""
        set_epoch = getattr(self.sampler, "set_epoch", None)
        if callable(set_epoch):
            set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.sampler) // self.global_batch

    def __iter__(self) -> Iterator:
        indices = list(iter(self.sampler))
        for start in range(0, len(indices) - self.global_batch + 1, self.global_batch):
            chunk = indices[start : start + self.global_batch]
            groups_idx = [
                chunk[i * self.per : (i + 1) * self.per] for i in range(self.n_data)
            ]
            groups = [[self._graph(i) for i in g] for g in groups_idx]

            # shared caps across all data shards => one compiled shape
            max_v = max(sum(g.num_nodes for g in grp) for grp in groups) + 1
            max_e = max(sum(g.num_edges for g in grp) for grp in groups)
            node_cap = round_up_ladder(max_v, self.node_ladder)
            edge_cap = round_up_ladder(max_e, self.edge_ladder)
            # edge cap must split evenly into even-sized shards
            q = 2 * self.n_edge_shards
            edge_cap = -(-edge_cap // q) * q

            targets = None
            if self.target_name is not None:
                arr = self.dataset._target_arrays[self.target_name]
                targets = {
                    self.target_name: np.stack(
                        [arr[np.asarray(g)] for g in groups_idx]
                    )
                }
            yield build_spmd_batch(
                groups,
                targets,
                node_cap=node_cap,
                edge_cap=edge_cap,
                graph_cap=self.per,
                n_edge_shards=self.n_edge_shards,
            )


def spmd_fit(trainer, state, loader, epochs: int = 1, log_fn=None, **fit_kwargs):
    """Epoch loop over a :class:`ShardedDataLoader` — delegates to
    :func:`notorch_tpu.training.loop.fit` (SPMD trainers satisfy its
    ``train_step`` contract), so ``checkpointer=``/``resume=True``/
    ``checkpoint_every=K`` give the sharded trainers the same preemption
    safety as the single-chip path: the Checkpointer detects sharded
    TrainStates and saves/restores them mesh-native.
    Returns ``(state, history)`` for backward compatibility."""
    from notorch_tpu.training.loop import fit

    res = fit(trainer, state, loader, epochs=epochs, log_fn=log_fn, **fit_kwargs)
    return res.state, res.history
