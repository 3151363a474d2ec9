"""Robustness fuzzing: the featurization layer must fail cleanly (never
crash with anything but SmilesParseError) on arbitrary garbage, and the
Python and native parsers must agree on accept/reject for random inputs."""

import random
import string

import pytest

from notorch_tpu import native
from notorch_tpu.chem.smiles import SmilesParseError, parse_smiles
from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

ALPHABET = "CNOSPFIBrclnos()[]=#-+@H1234567890/\\.%*"


def test_fuzz_python_parser_fails_cleanly():
    rng = random.Random(0)
    crashed = []
    for _ in range(2000):
        s = "".join(rng.choice(ALPHABET) for _ in range(rng.randint(1, 30)))
        try:
            mol = parse_smiles(s)
            # if parsed, featurization must also succeed
            Pipeline(SmiToMol(), MolToGraph())(s)
        except SmilesParseError:
            pass
        except Exception as e:  # pragma: no cover
            crashed.append((s, repr(e)))
    assert not crashed, crashed[:5]


@pytest.mark.skipif(not native.available(), reason="no C++ compiler")
def test_fuzz_native_agrees_on_accept():
    """Where both parsers accept, graphs must be identical; the native parser
    must never crash the process."""
    import numpy as np

    rng = random.Random(1)
    pipe = Pipeline(SmiToMol(), MolToGraph())
    checked = 0
    for _ in range(1500):
        s = "".join(rng.choice(ALPHABET) for _ in range(rng.randint(1, 25)))
        try:
            py = pipe(s)
        except SmilesParseError:
            py = None
        cc = native.featurize_smiles(s)
        if py is not None and cc is not None:
            np.testing.assert_array_equal(py.node_types, cc.node_types, err_msg=s)
            np.testing.assert_array_equal(py.src, cc.src, err_msg=s)
            checked += 1
    assert checked > 30  # enough random molecules actually parsed
