"""Feature databases: keyed lookups into on-disk feature stores.

Capability parity: reference ``notorch/databases/`` — ``Database`` ABC
(base.py:7-17) with NPZ/NPY (np.py), HDF5 (hdf5.py), and SDF (sdf.py)
implementations, including the lazy on-disk variants the reference left
disabled. All host-side.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from collections.abc import Mapping
from pathlib import Path

import numpy as np


class ClosedDatabaseError(RuntimeError):
    """Raised when reading from a lazy database outside its context
    (reference ``notorch/exceptions.py:28``)."""


class Database(ABC, Mapping):
    """A mapping with a ``collate`` for batching looked-up values
    (reference base.py:7-17)."""

    @abstractmethod
    def __getitem__(self, key): ...

    @abstractmethod
    def __len__(self): ...

    def __iter__(self):
        return iter(range(len(self)))

    def collate(self, values: list) -> np.ndarray:
        return np.stack([np.asarray(v) for v in values]).astype(np.float32)


class NPZDatabase(Database):
    """Feature matrix from one array of an ``.npz`` archive, int-indexed."""

    def __init__(self, path: str | Path, key: str, mmap: bool = False):
        self.path = Path(path)
        self.key = key
        with np.load(self.path, mmap_mode="r" if mmap else None) as npz:
            self.X = npz[key]

    def __getitem__(self, idx: int) -> np.ndarray:
        return self.X[idx]

    def __len__(self) -> int:
        return len(self.X)


class NPYDatabase(Database):
    """Feature matrix from an ``.npy`` file, optionally memory-mapped."""

    def __init__(self, path: str | Path, mmap: bool = False):
        self.path = Path(path)
        self.X = np.load(self.path, mmap_mode="r" if mmap else None)

    def __getitem__(self, idx: int) -> np.ndarray:
        return np.asarray(self.X[idx])

    def __len__(self) -> int:
        return len(self.X)


class HDF5Database(Database):
    """An HDF5 dataset, eagerly loaded (reference hdf5.py:16-36)."""

    def __init__(self, path: str | Path, dataset: str):
        import h5py

        self.path = Path(path)
        with h5py.File(self.path, "r") as f:
            self.X = f[dataset][:]

    def __getitem__(self, idx: int) -> np.ndarray:
        return self.X[idx]

    def __len__(self) -> int:
        return len(self.X)


class HDF5DatabaseOnDisk(Database):
    """Lazy HDF5 access inside a context manager (the variant the reference
    disabled, hdf5.py:39-75)."""

    def __init__(self, path: str | Path, dataset: str):
        self.path = Path(path)
        self.dataset = dataset
        self._file = None

    def __enter__(self):
        import h5py

        self._file = h5py.File(self.path, "r")
        return self

    def __exit__(self, *exc):
        self._file.close()
        self._file = None

    def __getitem__(self, idx: int) -> np.ndarray:
        if self._file is None:
            raise ClosedDatabaseError(f"database {self.path} is not open")
        return self._file[self.dataset][idx]

    def __len__(self) -> int:
        if self._file is None:
            import h5py

            with h5py.File(self.path, "r") as f:
                return len(f[self.dataset])
        return len(self._file[self.dataset])


class SDFDatabase(Database):
    """Molecules from an SDF (MDL mol-block) file, parsed with the built-in
    chemistry backend. The reference's eager variant read raw lines by
    mistake (sdf.py survey note); this one parses properly."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        text = self.path.read_text()
        self.mols = [_parse_molblock(b) for b in text.split("$$$$") if b.strip()]

    def __getitem__(self, idx: int):
        return self.mols[idx]

    def __len__(self) -> int:
        return len(self.mols)

    def collate(self, values: list) -> list:
        return list(values)


def _parse_molblock(block: str):
    """Parse a V2000 mol block into a Molecule."""
    from notorch_tpu.chem.mol import Atom, Bond, BondType, Molecule

    import numpy as np

    lines = block.strip("\n").split("\n")
    counts = lines[3]
    n_atoms, n_bonds = int(counts[:3]), int(counts[3:6])
    mol = Molecule()
    coords = np.zeros((n_atoms, 3), dtype=np.float32)
    for i in range(n_atoms):
        parts = lines[4 + i].split()
        coords[i] = [float(parts[0]), float(parts[1]), float(parts[2])]
        symbol = parts[3]
        mol.add_atom(Atom(symbol=symbol))
    mol.coords = coords
    order_map = {1: BondType.SINGLE, 2: BondType.DOUBLE, 3: BondType.TRIPLE, 4: BondType.AROMATIC}
    for i in range(n_bonds):
        ln = lines[4 + n_atoms + i]
        a, b, o = int(ln[:3]) - 1, int(ln[3:6]) - 1, int(ln[6:9])
        bt = order_map.get(o, BondType.SINGLE)
        if bt is BondType.AROMATIC:
            mol.atoms[a].aromatic = True
            mol.atoms[b].aromatic = True
        mol.add_bond(Bond(a, b, bt))
    return mol.finalize()
