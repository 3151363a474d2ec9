"""Test configuration: force a virtual 8-device CPU mesh before JAX loads.

This is the "fake backend" the reference lacks (SURVEY §4): multi-chip
sharding tests run on host-platform virtual devices.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment may pin a hardware platform (e.g. the axon TPU plugin)
# before conftest runs; config.update wins over the env var.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def smis():
    import csv

    with open(os.path.join(os.path.dirname(__file__), "data", "smis.csv")) as f:
        return [row["smiles"] for row in csv.DictReader(f)]


@pytest.fixture(scope="session")
def lipo_rows():
    import csv

    path = os.path.join(os.path.dirname(__file__), "data", "lipo.csv")
    with open(path) as f:
        rows = [(row["smiles"], float(row["lipo"])) for row in csv.DictReader(f)]
    return rows


@pytest.fixture()
def rng():
    # function-scoped: each test gets the same fresh stream regardless of
    # which other tests ran before it (a shared stream makes thresholds
    # order-dependent and flaky under -x / subset runs)
    return np.random.default_rng(0)
