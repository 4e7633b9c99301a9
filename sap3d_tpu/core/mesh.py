"""Device mesh and sharding helpers.

The reference has no distributed story at all (SURVEY.md section 2.9: its
"multi-GPU" mode is three independent single-GPU processes, train.sh:1-5).
Here data-parallelism is first-class: a 1-D ``jax.sharding.Mesh`` over all
local devices, batches sharded on the 'data' axis, parameters replicated;
XLA inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = -1, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` local devices."""
    devs = list(devices if devices is not None else jax.devices())
    if num_devices > 0:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with the batch axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


TIME_AXIS = "time"


def make_time_mesh(num_devices: int = -1, devices=None) -> Mesh:
    """1-D mesh over the clip's time axis for long-clip sequence parallelism.

    The reference fixes clips at 16 frames (SURVEY.md section 2.9); this mesh
    enables clips of length 16*k sharded across devices on the temporal axis.
    No model changes are required: constraining the input to
    ``time_sharding(mesh)`` lets GSPMD spatially partition every temporal
    conv/pool (halo exchanges inserted automatically) and gather for the
    global attention sites — verified bit-accurate against the replicated
    forward in tests/test_time_parallel.py.
    """
    devs = list(devices if devices is not None else jax.devices())
    if num_devices > 0:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (TIME_AXIS,))


def time_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 1 (time) of [B, T, H, W, C] clips across TIME_AXIS."""
    return NamedSharding(mesh, P(None, TIME_AXIS))
