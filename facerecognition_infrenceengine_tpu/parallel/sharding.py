"""Device mesh bootstrap and sharding helpers.

The reference has no distributed compute — its only scale axis is gallery
size, walked by a Python loop (reference infrenceServer.py:538-542), and its
"communication backend" is MongoDB polling (SURVEY.md §5.8).  Here the
gallery is a device array sharded over a mesh axis, and recognition is an
L2-normalized matmul + distributed top-k, so a 1M-ID gallery serves from a
v5e-8 slice with one collective per query batch.

Mesh axes:
- ``data``    — data parallelism over frames/queries (cameras fan in here).
- ``gallery`` — the gallery identity dimension (the "tensor parallel" axis:
  each chip holds a contiguous row shard of the [N, 512] gallery matrix).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "data"
AXIS_GALLERY = "gallery"


def build_mesh(devices=None, data: int | None = None, gallery: int | None = None) -> Mesh:
    """Build a 2-D (data, gallery) mesh over ``devices``.

    Defaults: all gallery-sharding (``data=1``) — gallery size is the axis
    that actually outgrows one chip.  Collectives along ``gallery`` ride ICI
    inside a slice.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if gallery is None:
        gallery = n // (data or 1)
    if data is None:
        data = n // gallery
    if data * gallery != n:
        raise ValueError(f"mesh {data}x{gallery} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, gallery)
    return Mesh(dev_array, (AXIS_DATA, AXIS_GALLERY))


def gallery_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for the [N, D] gallery matrix: rows split over the gallery axis."""
    return NamedSharding(mesh, P(AXIS_GALLERY, None))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Sharding for a batch of frames/queries: leading dim over data axis."""
    return NamedSharding(mesh, P(AXIS_DATA, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
