"""Dataset: table rows -> featurized samples -> padded device batches.

Capability parity: reference ``notorch/data/dataset.py`` (NotorchDataset) and
``notorch/data/managers.py`` (Transform/Database managers): per-sample
database lookups -> target attachment -> transform chain, and a collate that
produces ``inputs.*`` / ``targets.*`` keys. The TPU twist: collation pads
graphs to bucket caps so device shapes are static (see
``notorch_tpu.data.batching``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Sequence

import numpy as np

from notorch_tpu.conf import INPUT_KEY_PREFIX, TARGET_KEY_PREFIX
from notorch_tpu.data.graph import Graph, pad_graphs
from notorch_tpu.tasks import transforms as task_transforms


@dataclass
class TransformManager:
    """Adapt a Transform to dict-record plumbing (reference managers.py:22-65).
    Keys default from the transform's ``_in_key_``/``_out_key_`` classvars."""

    transform: Any
    in_key: str | None = None
    out_key: str | None = None

    def __post_init__(self):
        self.in_key = self.in_key or getattr(self.transform, "_in_key_", "input")
        self.out_key = self.out_key or getattr(self.transform, "_out_key_", "output")

    def update(self, sample: dict) -> dict:
        sample[self.out_key] = self.transform(sample[self.in_key])
        return sample

    def collate(self, values: list, **kwargs):
        return self.transform.collate(values, **kwargs)


@dataclass
class DatabaseManager:
    """Adapt a Database: fetch ``db[sample[in_key]]`` into ``out_key``
    (reference managers.py:68-98)."""

    db: Any
    in_key: str = "index"
    out_key: str = "X"

    def update(self, sample: dict) -> dict:
        sample[self.out_key] = self.db[sample[self.in_key]]
        return sample

    def collate(self, values: list, **kwargs):
        return self.db.collate(values)


@dataclass
class TargetSpec:
    """Columns + task type for one target group (reference ``TargetConfig``,
    types.py:41-43)."""

    columns: Sequence[str]
    task: str = "regression"
    weight: float = 1.0


class MolecularDataset:
    """A dataset over a DataFrame (or mapping of columns).

    Parameters
    ----------
    df : DataFrame | Mapping[str, sequence]
        the raw table; rows become samples
    transforms : dict[str, TransformManager | Transform]
        featurization chains, applied in order
    databases : dict[str, DatabaseManager] | None
        keyed feature stores attached per sample
    targets : dict[str, TargetSpec] | None
        named target groups read from the table columns
    """

    def __init__(
        self,
        df,
        transforms: Mapping[str, Any],
        databases: Mapping[str, DatabaseManager] | None = None,
        targets: Mapping[str, TargetSpec] | None = None,
    ):
        if hasattr(df, "to_dict"):
            self.records = df.to_dict("records")
        else:
            keys = list(df)
            n = len(df[keys[0]])
            self.records = [{k: df[k][i] for k in keys} for i in range(n)]
        self.transforms = {
            name: t if isinstance(t, TransformManager) else TransformManager(t)
            for name, t in transforms.items()
        }
        self.databases = dict(databases or {})
        self.targets = dict(targets or {})

        self._target_arrays = {
            name: self._extract_targets(spec) for name, spec in self.targets.items()
        }

    def __repr__(self) -> str:
        """Readable summary (reference ``NotorchDataset.__repr__``,
        dataset.py:81-130)."""
        lines = [f"{type(self).__name__}(n={len(self.records)}"]
        if self.transforms:
            lines.append("  transforms:")
            for name, tm in self.transforms.items():
                lines.append(
                    f"    ({name}): {type(tm.transform).__name__} "
                    f"[{tm.in_key!r} -> {tm.out_key!r}]"
                )
        if self.databases:
            lines.append("  databases:")
            for name, dm in self.databases.items():
                lines.append(f"    ({name}): {type(dm).__name__}")
        if self.targets:
            lines.append("  targets:")
            for name, spec in self.targets.items():
                lines.append(
                    f"    ({name}): columns={list(spec.columns)} task={spec.task!r}"
                )
        lines.append(")")
        return "\n".join(lines)

    def _extract_targets(self, spec: TargetSpec) -> np.ndarray:
        cols = list(spec.columns)
        if self.records:
            missing = [c for c in cols if c not in self.records[0]]
            if missing:
                raise KeyError(
                    f"target column(s) {missing} not in the table; available: "
                    f"{sorted(self.records[0])}"
                )
        out = np.full((len(self.records), len(cols)), np.nan, dtype=np.float32)
        for i, rec in enumerate(self.records):
            for j, c in enumerate(cols):
                v = rec.get(c)
                if v is not None and v == v:  # not NaN
                    out[i, j] = float(v)
        return out

    def __len__(self) -> int:
        return len(self.records)

    def __getitem__(self, idx: int) -> dict:
        sample = dict(self.records[idx])
        sample["index"] = idx
        for mgr in self.databases.values():
            mgr.update(sample)
        for mgr in self.transforms.values():
            mgr.update(sample)
        return sample

    def collate(
        self,
        samples: list[dict],
        indices: list[int],
        graph_caps: tuple[int, int] | None = None,
        batch_cap: int | None = None,
        layout: str = "flat",
    ) -> dict:
        """Build the flat batch dict with ``inputs.*`` / ``targets.*`` keys.

        ``layout="flat"``: one padded disjoint-union graph (``graph_caps`` =
        (node_cap, edge_cap)). ``layout="dense"``: per-molecule dense blocks
        (``graph_caps`` = (nodes_per_graph, edges_per_graph)).
        """
        batch: dict[str, Any] = {}
        b_cap = batch_cap if batch_cap is not None else len(samples)

        for name, mgr in {**self.databases, **self.transforms}.items():
            values = [s[mgr.out_key] for s in samples]
            if values and isinstance(values[0], Graph):
                if layout == "dense_packed":
                    from notorch_tpu.data.dense import pack_graphs_dense

                    n_shards = 1
                    if graph_caps is not None:
                        v_b, e_b, bin_cap, *rest = graph_caps
                        n_shards = rest[0] if rest else 1
                    else:
                        e_b = max(max((g.num_edges for g in values), default=2), 2)
                        e_b += e_b % 2
                        v_b = max(g.num_nodes for g in values) + 1
                        bin_cap = None
                    collated = pack_graphs_dense(
                        values, v_b, e_b, mol_cap=b_cap, bin_cap=bin_cap,
                        n_shards=n_shards,
                    )
                elif layout == "dense":
                    from notorch_tpu.data.dense import pad_graphs_dense

                    if graph_caps is not None:
                        v_m, e_m = graph_caps
                    else:
                        v_m = max(g.num_nodes for g in values) + 1
                        e_m = max(max(g.num_edges for g in values), 2)
                        e_m += e_m % 2
                    collated = pad_graphs_dense(values, v_m, e_m, graph_cap=b_cap)
                elif graph_caps is not None:
                    v_cap, e_cap = graph_caps
                    collated = pad_graphs(values, v_cap, e_cap, graph_cap=b_cap)
                else:
                    v_cap = sum(g.num_nodes for g in values) + 1
                    e_cap = max(sum(g.num_edges for g in values), 1)
                    collated = pad_graphs(values, v_cap, e_cap, graph_cap=b_cap)
            else:
                collated = mgr.collate(values)
                if isinstance(collated, np.ndarray):
                    collated = _pad_rows(collated, b_cap, fill=0.0)
            batch[f"{INPUT_KEY_PREFIX}.{mgr.out_key}"] = collated

        for name, arr in self._target_arrays.items():
            rows = arr[np.asarray(indices)]
            rows = _pad_rows(rows, b_cap, fill=np.nan)
            mask = ~np.isnan(rows)
            batch[f"{TARGET_KEY_PREFIX}.{name}"] = np.nan_to_num(rows, nan=0.0)
            batch[f"{TARGET_KEY_PREFIX}.{name}_mask"] = mask
        return batch

    def build_task_transform_configs(self) -> dict[str, dict]:
        """Per-target normalization transforms from *this* dataset's target
        statistics (reference dataset.py:73-79 + nn/transforms.py:71-98)."""
        out = {}
        for name, spec in self.targets.items():
            values = self._target_arrays[name]
            cfg = task_transforms.build(spec.task, values)
            out[name] = {
                "preds": {"module": cfg["preds"], "key": None},
                "targets": {"module": cfg["targets"], "key": f"{TARGET_KEY_PREFIX}.{name}"},
            }
        return out


def _pad_rows(arr, cap: int, fill: float = 0.0):
    arr = np.asarray(arr)
    if len(arr) >= cap:
        return arr
    pad = np.zeros((cap - len(arr),) + arr.shape[1:], dtype=arr.dtype)
    if fill != 0.0 and arr.dtype.kind == "f":
        pad[:] = fill
    return np.concatenate([arr, pad], axis=0)
