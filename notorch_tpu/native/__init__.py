"""Native (C++) featurization bindings.

Loads ``native/featurizer.cpp`` via ctypes, building it on first use with the
system compiler (no pybind11 needed). Falls back cleanly when no compiler is
available — callers check :func:`available`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_LIB = None
_TRIED = False

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "featurizer.cpp"


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    cache = Path(os.environ.get("NOTORCH_TPU_CACHE", Path.home() / ".cache" / "notorch_tpu"))
    cache.mkdir(parents=True, exist_ok=True)
    so_path = cache / "libfeaturizer.so"
    try:
        if not so_path.exists() or _SRC.stat().st_mtime > so_path.stat().st_mtime:
            cmd = [
                os.environ.get("CXX", "g++"),
                "-O3",
                "-shared",
                "-fPIC",
                "-std=c++17",
                "-o",
                str(so_path),
                str(_SRC),
                "-lpthread",
            ]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(so_path))
    except (OSError, subprocess.SubprocessError, FileNotFoundError):
        return None

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.ntpu_featurize.argtypes = [
        ctypes.c_char_p, i32p, i32p, i32p, i32p, i32p, i32p, ctypes.c_int, ctypes.c_int,
    ]
    lib.ntpu_featurize.restype = ctypes.c_int
    lib.ntpu_featurize_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_int, i32p, i32p, i32p, i32p, i32p, i32p, i32p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.ntpu_featurize_batch.restype = ctypes.c_int
    _LIB = lib
    return lib


def available() -> bool:
    return _build_and_load() is not None


def featurize_smiles(smi: str, max_atoms: int = 256, max_edges: int = 512):
    """SMILES -> Graph via the native path. Returns None on parse failure."""
    from notorch_tpu.data.graph import Graph

    lib = _build_and_load()
    if lib is None:
        raise RuntimeError("native featurizer unavailable (no compiler?)")

    node_types = np.zeros((max_atoms, 7), np.int32)
    edge_types = np.zeros((max_edges, 2), np.int32)
    src = np.zeros(max_edges, np.int32)
    dst = np.zeros(max_edges, np.int32)
    n_atoms = np.zeros(1, np.int32)
    n_edges = np.zeros(1, np.int32)
    rc = lib.ntpu_featurize(
        smi.encode(), node_types.ravel(), edge_types.ravel(), src, dst, n_atoms, n_edges,
        max_atoms, max_edges,
    )
    if rc != 0:
        return None
    V, E = int(n_atoms[0]), int(n_edges[0])
    rev = np.arange(E, dtype=np.int32).reshape(-1, 2)[:, ::-1].ravel()
    return Graph(
        node_types=node_types[:V].copy(),
        edge_types=edge_types[:E].copy(),
        src=src[:E].copy(),
        dst=dst[:E].copy(),
        rev=rev,
    )


def featurize_batch(
    smis: list[str],
    max_atoms: int = 256,
    max_edges: int = 512,
    n_threads: int = 0,
):
    """Parallel batch featurization. Returns (graphs, status) where
    ``status[i] != 0`` marks a failed molecule (its graph is None)."""
    from notorch_tpu.data.graph import Graph

    lib = _build_and_load()
    if lib is None:
        raise RuntimeError("native featurizer unavailable (no compiler?)")
    n = len(smis)
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, 16)

    node_types = np.zeros((n, max_atoms, 7), np.int32)
    edge_types = np.zeros((n, max_edges, 2), np.int32)
    src = np.zeros((n, max_edges), np.int32)
    dst = np.zeros((n, max_edges), np.int32)
    n_atoms = np.zeros(n, np.int32)
    n_edges = np.zeros(n, np.int32)
    status = np.zeros(n, np.int32)
    lib.ntpu_featurize_batch(
        "\n".join(smis).encode(), n, node_types.ravel(), edge_types.ravel(),
        src.ravel(), dst.ravel(), n_atoms, n_edges, status, max_atoms, max_edges, n_threads,
    )
    graphs = []
    for i in range(n):
        if status[i] != 0:
            graphs.append(None)
            continue
        V, E = int(n_atoms[i]), int(n_edges[i])
        rev = np.arange(E, dtype=np.int32).reshape(-1, 2)[:, ::-1].ravel()
        graphs.append(
            Graph(
                node_types=node_types[i, :V].copy(),
                edge_types=edge_types[i, :E].copy(),
                src=src[i, :E].copy(),
                dst=dst[i, :E].copy(),
                rev=rev,
            )
        )
    return graphs, status


class NativeSmiToGraph:
    """Drop-in transform: SMILES -> Graph through the C++ featurizer
    (same output as ``Pipeline(SmiToMol(), MolToGraph())``)."""

    _in_key_ = "smi"
    _out_key_ = "G"

    def __init__(self, max_atoms: int = 256, max_edges: int = 512):
        self.max_atoms = max_atoms
        self.max_edges = max_edges
        self.num_node_types = 42
        self.num_edge_types = 13

    def __call__(self, smi: str):
        g = featurize_smiles(smi, self.max_atoms, self.max_edges)
        if g is None:
            raise ValueError(f"native featurizer failed to parse {smi!r}")
        return g

    @staticmethod
    def collate(graphs, node_cap=None, edge_cap=None):
        from notorch_tpu.transforms.graph import MolToGraph

        return MolToGraph.collate(graphs, node_cap, edge_cap)
