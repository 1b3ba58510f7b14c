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


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the JAX multi-host runtime when launched as one process
    per host (the TPU-pod equivalent of the reference's missing
    distributed backend — SURVEY.md §5 "Distributed communication").

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
    when arguments are omitted (the standard GKE/TPU-VM launcher env);
    returns False (no-op) when neither arguments nor env are present, so
    single-host runs need no configuration.  After initialization,
    ``jax.devices()`` spans every host and ``make_mesh()`` builds the
    global mesh — all collectives in ``parallel/ops.py`` then ride ICI
    within a slice and DCN across hosts, with no further code changes.
    """
    import os

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return False
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0")
    )
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_mesh(shape: Sequence[int] = (), axis_names: Sequence[str] = ()) -> Mesh:
    """Create a device mesh; defaults to 1-D over all devices as 'poly'.

    Spans all hosts' devices after ``init_distributed()``.
    """
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
