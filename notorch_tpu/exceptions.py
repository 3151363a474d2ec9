"""Framework exceptions.

Capability parity: reference ``notorch/exceptions.py`` (InvalidShapeError,
ClosedDatabaseError, InvalidChoiceError, pretty_shape).
"""

from __future__ import annotations

from collections.abc import Collection, Sequence

from notorch_tpu.data.databases import ClosedDatabaseError  # re-export

__all__ = ["InvalidShapeError", "ClosedDatabaseError", "InvalidChoiceError", "pretty_shape"]


def pretty_shape(shape: Sequence[int]) -> str:
    return " x ".join(str(s) for s in shape)


class InvalidShapeError(ValueError):
    def __init__(self, name: str, received: Sequence[int], expected: Collection[Sequence[int]]):
        exp = " | ".join(pretty_shape(s) for s in expected)
        super().__init__(
            f"argument {name!r} had invalid shape: got {pretty_shape(received)}, expected {exp}"
        )


class InvalidChoiceError(ValueError):
    def __init__(self, choice, choices: Collection):
        super().__init__(f"invalid choice {choice!r}; expected one of {sorted(map(str, choices))}")
