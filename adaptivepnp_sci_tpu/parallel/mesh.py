"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, frame: int = 1, devices=None) -> Mesh:
    """Build a ``(data, frame)`` mesh from the first ``data*frame`` devices.

    ``frame`` should map to the fastest interconnect (ICI) since halo
    exchanges ride it every denoiser call; ``data`` tolerates DCN.
    """
    if devices is None:
        devices = jax.devices()
    n = data * frame
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(data, frame)
    return Mesh(arr, ("data", "frame"))


def frame_sharding(mesh: Mesh, axis: int = 0) -> NamedSharding:
    """Shard the given array axis over the 'frame' mesh axis."""
    spec = [None] * (axis + 1)
    spec[axis] = "frame"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
