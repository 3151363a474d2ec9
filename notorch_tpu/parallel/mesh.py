"""Device mesh construction helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(axes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a mesh from ``{axis_name: size}``.

    Default: all local devices on a single ``"data"`` axis. Sizes must
    multiply to the device count; axis order follows dict order (put the
    fastest-communicating axis last so it lands on the innermost ICI ring).
    """
    devices = list(devices if devices is not None else jax.devices())
    if axes is None:
        axes = {"data": len(devices)}
    sizes = tuple(axes.values())
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(f"mesh {axes} does not match {len(devices)} devices")
    mesh_devices = np.asarray(devices).reshape(sizes)
    return Mesh(mesh_devices, tuple(axes.keys()))
