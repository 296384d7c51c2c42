"""Device-mesh construction (ICI-first layout)."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("rows",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a Mesh over the first ``n_devices`` devices.

    For 1-D meshes (the common case for row-partitioned sparse work) the
    devices are used in their default order, which on a TPU slice follows
    the ICI torus — neighbouring shards exchange halos over ICI links, not
    DCN (SURVEY.md §5.8).
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    devs = devs[:n_devices]
    if shape is None:
        shape = (n_devices,)
    if int(np.prod(shape)) != n_devices:
        raise ValueError(f"mesh shape {shape} != {n_devices} devices")
    if len(shape) != len(axis_names):
        raise ValueError("axis_names must match mesh shape rank")
    return Mesh(np.asarray(devs).reshape(shape), axis_names)
