"""Device mesh + sharding helpers for multi-chip proving.

The reference has NO distributed execution (rayon shared-memory only —
SURVEY.md §2.5); this module is its TPU-native replacement.  Scale axes:

* ``data`` — proof-batch parallelism (independent witness instances);
* ``poly`` — domain sharding: every polynomial array (n, L) is sharded on
  the evaluation/coefficient axis; NTT butterflies, grand-product scans and
  MSM bucket work then run SPMD with XLA-inserted collectives (the rolls,
  takes and sorts in the kernels become ppermute/all-to-all under GSPMD).

Round 1 relies on the SPMD partitioner for the exchange schedule; dedicated
shard_map + pallas ring kernels are the planned optimization path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Sequence[int] = (), axis_names: Sequence[str] = ()) -> Mesh:
    """Create a device mesh; defaults to 1-D over all devices as 'poly'."""
    devices = np.asarray(jax.devices())
    if not shape:
        shape = (len(devices),)
        axis_names = ("poly",)
    return Mesh(devices.reshape(shape), axis_names)


def poly_sharding(mesh: Mesh, axis: str = "poly") -> NamedSharding:
    """Shard a (n, L) polynomial on the n axis."""
    return NamedSharding(mesh, P(axis, None))


def batch_poly_sharding(mesh: Mesh, axis: str = "poly") -> NamedSharding:
    """Shard a (B, n, L) stacked polynomial batch on the n axis."""
    return NamedSharding(mesh, P(None, axis, None))


def points_sharding(mesh: Mesh, axis: str = "poly") -> NamedSharding:
    """Shard (n, 3, L) EC point arrays on the n axis."""
    return NamedSharding(mesh, P(axis, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_poly(mesh: Mesh, arr, batch: bool = False):
    sh = batch_poly_sharding(mesh) if batch else poly_sharding(mesh)
    return jax.device_put(arr, sh)
