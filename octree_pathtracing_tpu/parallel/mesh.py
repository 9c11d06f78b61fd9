"""Device meshes and sharding layout for the renderer.

The reference scales with rayon tiles on one host
(``/root/reference/src/renderer/tile_renderer.rs:398-413,473``); the TPU-native
equivalent shards the *ray batch* over a device mesh (SURVEY.md §5
long-context analog):

- axis ``dp`` (data/pixel): pixel lanes sharded across chips;
- axis ``sp`` (sample): samples-per-pixel sharded across chips;

Scene tables (octree pool, materials, atlas) are replicated — the reference's
single shared octree.  Sample reduction is a ``psum`` over ``sp``; image
assembly stays sharded over ``dp`` until the host gathers; gradient
all-reduce for inverse rendering is a ``psum`` over both axes riding ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

DP_AXIS = "dp"
SP_AXIS = "sp"


def make_mesh(n_devices: int | None = None, sp: int | None = None) -> Mesh:
    """Build a (dp, sp) mesh over the available devices.

    ``sp`` defaults to 2 when the device count allows, else 1 — sample
    parallelism only pays once there are chips to spare.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if sp is None:
        sp = 2 if n % 2 == 0 and n >= 4 else 1
    dp = n // sp
    assert dp * sp == n, f"cannot factor {n} devices into (dp={dp}, sp={sp})"
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, (DP_AXIS, SP_AXIS))


def ray_spec():
    """(S, B, ...) sample-major ray batches: samples over sp, lanes over dp."""
    return P(SP_AXIS, DP_AXIS)


def pixel_spec():
    return P(DP_AXIS)


def replicated_spec():
    return P()
