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
