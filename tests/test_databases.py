"""Database implementations: NPZ/NPY/HDF5 (+lazy)/SDF roundtrips and
dataset integration."""

import numpy as np
import pytest

from notorch_tpu.data.databases import (
    ClosedDatabaseError,
    HDF5Database,
    HDF5DatabaseOnDisk,
    NPYDatabase,
    NPZDatabase,
    SDFDatabase,
)

MOLBLOCK = """
  test
  program
  comment
  3  2  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    1.5000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    2.2000    1.2000    0.0000 O   0  0  0  0  0  0  0  0  0  0  0  0
  1  2  1  0
  2  3  1  0
M  END
$$$$
  test2
  program
  comment
  2  1  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 N   0  0  0  0  0  0  0  0  0  0  0  0
    1.5000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
  1  2  3  0
M  END
$$$$
"""


def test_npz_npy(tmp_path, rng):
    X = rng.normal(size=(10, 4)).astype(np.float32)
    np.savez(tmp_path / "f.npz", feats=X)
    np.save(tmp_path / "f.npy", X)

    for db in [NPZDatabase(tmp_path / "f.npz", key="feats"), NPYDatabase(tmp_path / "f.npy")]:
        assert len(db) == 10
        np.testing.assert_allclose(db[3], X[3])
        batch = db.collate([db[0], db[5]])
        assert batch.shape == (2, 4) and batch.dtype == np.float32


def test_hdf5(tmp_path, rng):
    import h5py

    X = rng.normal(size=(6, 3)).astype(np.float32)
    with h5py.File(tmp_path / "f.h5", "w") as f:
        f.create_dataset("X", data=X)

    db = HDF5Database(tmp_path / "f.h5", dataset="X")
    assert len(db) == 6
    np.testing.assert_allclose(db[2], X[2])

    lazy = HDF5DatabaseOnDisk(tmp_path / "f.h5", dataset="X")
    with pytest.raises(ClosedDatabaseError):
        lazy[0]
    with lazy:
        np.testing.assert_allclose(lazy[4], X[4])
    with pytest.raises(ClosedDatabaseError):
        lazy[0]


def test_sdf(tmp_path):
    path = tmp_path / "mols.sdf"
    path.write_text(MOLBLOCK)
    db = SDFDatabase(path)
    assert len(db) == 2
    m0 = db[0]
    assert [a.GetSymbol() for a in m0.atoms] == ["C", "C", "O"]
    assert m0.atoms[0].GetTotalNumHs() == 3  # CH3 from valence model
    m1 = db[1]
    assert m1.bonds[0].order() == 3.0


def test_database_in_dataset(tmp_path, rng):
    """DatabaseManager attaches per-row features that flow into batches
    (reference managers.py:68-98 + dataset.py:44-54)."""
    from notorch_tpu.data.batching import DataLoader
    from notorch_tpu.data.dataset import (
        DatabaseManager,
        MolecularDataset,
        TargetSpec,
        TransformManager,
    )
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    X = rng.normal(size=(4, 8)).astype(np.float32)
    np.save(tmp_path / "extra.npy", X)

    ds = MolecularDataset(
        {"smiles": ["CCO", "CCN", "CCC", "CCF"], "y": [1.0, 2.0, 3.0, 4.0]},
        transforms={
            "g": TransformManager(Pipeline(SmiToMol(), MolToGraph()), in_key="smiles")
        },
        databases={
            "extra": DatabaseManager(NPYDatabase(tmp_path / "extra.npy"), out_key="X_f")
        },
        targets={"y": TargetSpec(columns=["y"])},
    )
    batch = next(iter(DataLoader(ds, batch_size=4)))
    np.testing.assert_allclose(batch["inputs.X_f"], X)
