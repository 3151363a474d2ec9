"""Small shared utilities.

Capability parity: reference ``notorch/utils/utils.py`` (``EnumMapping``)
and ``utils/mixins.py`` (ndarray collation). The reference's ``UpdateMixin``
(functional copy-with-changes) is subsumed by ``flax.struct`` ``replace`` on
every pytree container here.
"""

from __future__ import annotations

from enum import Enum

import numpy as np


class EnumMapping(Enum):
    """A string-keyed enum with forgiving lookup (reference utils.py:8-30)."""

    @classmethod
    def get(cls, name):
        if isinstance(name, cls):
            return name
        try:
            return cls[str(name).upper().replace("-", "_")]
        except KeyError:
            raise KeyError(
                f"unknown {cls.__name__} member {name!r}; expected one of "
                f"{[m.name for m in cls]}"
            ) from None


def collate_ndarrays(values: list) -> np.ndarray:
    """Stack ndarrays into one float32 batch (reference mixins.py:10-12)."""
    return np.stack([np.asarray(v) for v in values]).astype(np.float32)


def enable_compilation_cache(directory: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache so bucket-shape compiles
    carry across PROCESSES — the reference serving story recompiles nothing
    because torch has no trace step; here a cold server process would
    otherwise re-Mosaic/XLA-compile every bucket shape (measured 3.3x
    cold/warm on v5e serving, BASELINE.md round 4).

    Directory resolution: the argument, else ``$NOTORCH_TPU_COMPILATION_CACHE``,
    else ``~/.cache/notorch_tpu/xla``. Set the env var to ``"0"``/``"off"``
    to disable. Returns the directory used (None when disabled). Safe to
    call more than once; every CLI entry point calls it."""
    import os

    if directory is None:
        directory = os.environ.get("NOTORCH_TPU_COMPILATION_CACHE")
    if directory in ("0", "off", "none"):
        return None
    if not directory:
        directory = os.path.join(
            os.path.expanduser("~"), ".cache", "notorch_tpu", "xla"
        )
    import jax

    os.makedirs(directory, exist_ok=True)
    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(directory))
    if prev and prev != str(directory):
        # the cache handle is created lazily ONCE; a later dir change is
        # silently ignored without a reset (observed: a second Checkpointer
        # dir in the same process kept writing to the first)
        try:
            from jax._src import compilation_cache as _cc

            _cc.reset_cache()
        except Exception:
            pass
    # cache every compile, however small/fast — molecular-graph programs are
    # tiny by XLA standards and would otherwise all fall under the default
    # size/time thresholds
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return str(directory)
