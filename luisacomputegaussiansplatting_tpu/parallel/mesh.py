"""Device-mesh helpers.

The reference is strictly single-device (one Device + one Stream,
app/main.cpp:162-163); every multi-chip facility here is new TPU-native
design: jax.sharding.Mesh over ICI, collectives inserted by shard_map.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    shape: tuple[int, ...] | None = None,
    axis_names: tuple[str, ...] = ("gs",),
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    Default: a 1D mesh named "gs" (gaussian/tile sharding axis) over all
    devices. For multi-view training use e.g. shape=(V, D//V),
    axis_names=("data", "gs").
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices),)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)
