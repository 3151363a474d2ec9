"""Molecule (with 3D coordinates) -> PointCloud transform.

The spatial data path: SDF mol blocks carry conformer coordinates
(``Molecule.coords``); this transform featurizes atoms with the standard
type-index scheme and pairs them with the coordinates for the spatial models
(SchNet/GVP/PaiNN). Collation pads to static caps.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import ClassVar

import numpy as np

from notorch_tpu.chem.mol import Molecule
from notorch_tpu.data.point_cloud import PointCloud, pad_point_clouds
from notorch_tpu.transforms.atom import AtomTransform, MultiTypeAtomTransform


@dataclass
class MolToPointCloud:
    _in_key_: ClassVar[str] = "mol"
    _out_key_: ClassVar[str] = "P"

    atom_transform: AtomTransform = field(default_factory=MultiTypeAtomTransform)

    @property
    def num_node_types(self) -> int:
        return len(self.atom_transform)

    def __call__(self, mol: Molecule) -> PointCloud:
        coords = getattr(mol, "coords", None)
        if coords is None:
            raise ValueError(
                "molecule has no 3D coordinates; point clouds need conformers "
                "(e.g. from an SDF database)"
            )
        return PointCloud(
            node_types=self.atom_transform(mol.GetAtoms()).astype(np.int32),
            coords=np.asarray(coords, dtype=np.float32),
        )

    @staticmethod
    def collate(clouds: list[PointCloud], node_cap: int | None = None):
        total = sum(c.num_nodes for c in clouds)
        cap = node_cap if node_cap is not None else -(-total // 64) * 64
        return pad_point_clouds(clouds, cap)
