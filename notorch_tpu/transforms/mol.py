"""Molecule -> Morgan fingerprint transform.

Capability parity: reference ``notorch/transforms/mol.py:17-51``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import numpy as np

from notorch_tpu.chem.fingerprint import morgan_fingerprint
from notorch_tpu.chem.mol import Molecule


@dataclass
class MolToFP:
    _in_key_: ClassVar[str] = "mol"
    _out_key_: ClassVar[str] = "fp"

    radius: int = 2
    length: int = 2048
    count: bool = False

    def __call__(self, mol: Molecule) -> np.ndarray:
        return morgan_fingerprint(mol, self.radius, self.length, self.count)

    def collate(self, fps: list[np.ndarray]) -> np.ndarray:
        return np.stack(fps).astype(np.float32)


def morgan(radius: int = 2, length: int = 2048, count: bool = False) -> MolToFP:
    return MolToFP(radius, length, count)
