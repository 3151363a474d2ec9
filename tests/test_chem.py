"""Chemistry backend unit tests."""

import numpy as np
import pytest

from notorch_tpu.chem import (
    BondStereo,
    BondType,
    Hybridization,
    morgan_fingerprint,
    parse_reaction_smiles,
    parse_smiles,
)
from notorch_tpu.chem.smiles import MolFromSmiles, SmilesParseError


def test_benzene():
    m = parse_smiles("c1ccccc1")
    assert m.GetNumAtoms() == 6
    assert m.GetNumBonds() == 6
    assert all(a.GetIsAromatic() for a in m.atoms)
    assert all(a.GetTotalNumHs() == 1 for a in m.atoms)
    assert all(b.GetBondType() is BondType.AROMATIC for b in m.bonds)


def test_implicit_hs():
    cases = {
        "C": [4],
        "CC": [3, 3],
        "C=C": [2, 2],
        "C#N": [1, 0],
        "O": [2],
        "CO": [3, 1],
        "c1ccncc1": [1, 1, 1, 0, 1, 1],
        "c1ccsc1": [1, 1, 1, 0, 1],
        "c1cc[nH]c1": [1, 1, 1, 1, 1],
        "[NH4+]": [4],
        "[O-]C": [0, 3],
        "C(=O)O": [1, 0, 1],
    }
    for smi, hs in cases.items():
        m = parse_smiles(smi)
        assert [a.GetTotalNumHs() for a in m.atoms] == hs, smi


def test_charges_and_maps():
    m = parse_smiles("[CH3:7][N+:2](C)(C)C")
    assert m.atoms[0].GetAtomMapNum() == 7
    assert m.atoms[1].GetFormalCharge() == 1
    assert m.atoms[1].GetAtomMapNum() == 2


def test_ring_bond_demotion():
    # biphenyl junction must be a single bond, not aromatic
    m = parse_smiles("c1ccccc1c1ccccc1")
    orders = sorted(b.GetBondType().name for b in m.bonds)
    assert orders.count("SINGLE") == 1
    assert orders.count("AROMATIC") == 12


def test_stereo_perception():
    trans = parse_smiles("F/C=C/F")
    cis = parse_smiles("F/C=C\\F")
    assert [b.stereo for b in trans.bonds if b.bond_type is BondType.DOUBLE] == [BondStereo.TRANS]
    assert [b.stereo for b in cis.bonds if b.bond_type is BondType.DOUBLE] == [BondStereo.CIS]


def test_hybridization():
    m = parse_smiles("CC=CC#C")
    hybs = [a.GetHybridization() for a in m.atoms]
    assert hybs[0] is Hybridization.SP3
    assert hybs[1] is Hybridization.SP2
    assert hybs[3] is Hybridization.SP


def test_ring_closure_percent_and_dot():
    m = parse_smiles("C%10CCCCC%10.O")
    assert m.GetNumAtoms() == 7
    assert m.GetNumBonds() == 6


def test_parse_failures():
    assert MolFromSmiles("C(") is None
    assert MolFromSmiles("C1CC") is None
    with pytest.raises(SmilesParseError):
        parse_smiles("Zz")


def test_all_fixture_smiles_parse(smis):
    for smi in smis:
        m = parse_smiles(smi)
        assert m.GetNumAtoms() > 0


def test_reaction_smiles():
    r, p = parse_reaction_smiles("[CH3:1][OH:2]>>[CH2:1]=[O:2]")
    assert r.GetNumAtoms() == 2 and p.GetNumAtoms() == 2
    assert r.atoms[0].GetAtomMapNum() == 1


def test_morgan_fingerprint_properties():
    a = morgan_fingerprint(parse_smiles("CCO"), radius=2, num_bits=2048)
    b = morgan_fingerprint(parse_smiles("OCC"), radius=2, num_bits=2048)
    c = morgan_fingerprint(parse_smiles("c1ccccc1"), radius=2, num_bits=2048)
    assert a.shape == (2048,)
    np.testing.assert_array_equal(a, b)  # invariant to atom order
    assert (a != c).any()
    counts = morgan_fingerprint(parse_smiles("CCO"), count=True)
    assert counts.sum() >= a.sum()
