"""Scaffold split tests."""

import numpy as np

from notorch_tpu.chem import parse_smiles
from notorch_tpu.data.splits import murcko_scaffold_atoms, scaffold_key, scaffold_split


def test_murcko_scaffold_atoms():
    # toluene: scaffold = benzene ring (6 atoms), methyl stripped
    m = parse_smiles("Cc1ccccc1")
    atoms = murcko_scaffold_atoms(m)
    assert len(atoms) == 6
    assert all(m.atoms[a].aromatic for a in atoms)

    # biphenyl with a linker keeps the linker: c1ccccc1Cc1ccccc1 -> 13 atoms
    m2 = parse_smiles("c1ccccc1Cc1ccccc1")
    assert len(murcko_scaffold_atoms(m2)) == 13

    # acyclic molecule has no scaffold
    assert murcko_scaffold_atoms(parse_smiles("CCOCC")) == set()


def test_scaffold_key_groups_derivatives():
    benzene_like = ["c1ccccc1", "Cc1ccccc1", "CCc1ccccc1", "c1ccccc1O", "Nc1ccccc1C"]
    keys = {scaffold_key(s) for s in benzene_like}
    assert len(keys) == 1  # all share the benzene scaffold

    different = ["c1ccncc1", "C1CCCCC1", "c1ccc2ccccc2c1"]
    keys2 = {scaffold_key(s) for s in different}
    assert len(keys2) == 3
    assert keys.isdisjoint(keys2)

    # acyclic molecules share the sentinel
    assert scaffold_key("CCO") == scaffold_key("CCCC") == 0


def test_scaffold_split_no_leakage(smis):
    train, val, test = scaffold_split(smis, (0.7, 0.15, 0.15), seed=0)
    assert len(train) + len(val) + len(test) == len(smis)
    assert not (set(train) & set(val)) and not (set(val) & set(test))

    key_by_idx = {i: scaffold_key(s) for i, s in enumerate(smis)}
    folds = [set(train), set(val), set(test)]
    for key in set(key_by_idx.values()):
        members = {i for i, k in key_by_idx.items() if k == key}
        # every scaffold group lives entirely inside one fold
        assert any(members <= f for f in folds), key

    # fraction sanity (greedy fill; generous tolerance)
    assert len(train) >= 0.5 * len(smis)
    assert len(test) >= 1
