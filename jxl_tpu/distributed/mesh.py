"""Device-mesh setup for multi-chip encode/decode.

Replaces the reference's "distributed backend" — six OS threads each driving
a Docker container over subprocess `docker exec`, rendezvousing through CSV
files on the host FS (`docker_manager.rs:227-255`, SURVEY §2.3) — with JAX
shardings over a device mesh:

- axis "data":  corpus-level data parallelism (the worker-pool analog);
  each device encodes different images of the batch.
- axis "space": intra-image spatial parallelism (the sequence-parallel
  analog the reference lacks): an image's block columns are sharded, with
  cross-device state (DC prefix sums, histogram reductions) handled by XLA
  collectives inserted at the sharding boundaries.

Multi-host initialization (`jax.distributed.initialize`) is the caller's
responsibility; these helpers only shape the local mesh view.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, data: int | None = None, space: int | None = None) -> Mesh:
    """Build a ("data", "space") mesh over the first n_devices devices.

    Defaults: all devices on the data axis (pure corpus DP), space=1.
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if data is None and space is None:
        data, space = n_devices, 1
    elif data is None:
        data = n_devices // space
    elif space is None:
        space = n_devices // data
    assert data * space == n_devices, (data, space, n_devices)
    arr = np.array(devs).reshape(data, space)
    return Mesh(arr, ("data", "space"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """[B, H, W, 3] batches: images over "data", width over "space"."""
    return NamedSharding(mesh, P("data", None, "space", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
