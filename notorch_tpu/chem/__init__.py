"""Host-side chemistry backend (RDKit-free, with RDKit-compatible accessors)."""

from notorch_tpu.chem.mol import (
    Atom,
    Bond,
    BondStereo,
    BondType,
    ChiralTag,
    Hybridization,
    Molecule,
)
from notorch_tpu.chem.smiles import (
    MolFromSmiles,
    SmilesParseError,
    parse_reaction_smiles,
    parse_smiles,
)
from notorch_tpu.chem.fingerprint import morgan_fingerprint

__all__ = [
    "Atom",
    "Bond",
    "BondStereo",
    "BondType",
    "ChiralTag",
    "Hybridization",
    "Molecule",
    "MolFromSmiles",
    "SmilesParseError",
    "parse_reaction_smiles",
    "parse_smiles",
    "morgan_fingerprint",
]
