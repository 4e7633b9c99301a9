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


def initialize_distributed(**kw) -> None:
    """Multi-host hook: call once per process before any jax use on a
    multi-host slice.  After this, jax.devices() is GLOBAL and make_mesh
    spans the whole slice.

    With explicit kwargs (coordinator_address/num_processes/process_id — the
    CLI's --coordinator/--num-processes/--process-id), failures PROPAGATE: a
    misconfigured coordinator must not be silently swallowed.  Without
    kwargs (TPU-pod auto-detection), a RuntimeError from running outside a
    multi-host environment (or double initialization) is a benign no-op."""
    if kw:
        jax.distributed.initialize(**kw)
        return
    try:
        jax.distributed.initialize()
    except RuntimeError as e:  # already initialized
        print(f"jax.distributed.initialize skipped: {e}")
    except ValueError as e:  # "coordinator_address should be defined":
        # not a multi-host environment and none specified — single process
        print(f"jax.distributed.initialize skipped: {e}")


def make_mesh(num_devices: int = -1, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices.

    jax.devices() is the GLOBAL device list: on a multi-host slice (after
    initialize_distributed) the mesh spans every chip of every host, and
    shard_batch assembles global arrays from per-host shards."""
    devs = list(devices if devices is not None else jax.devices())
    if num_devices > 0:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def macro_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [K, B, ...] macro-batches of the fused multi-step path:
    the scan axis K stays replicated, the batch axis B is data-sharded
    (matching make_multi_train_step's in_shardings, train/steps.py)."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_batch(mesh: Mesh, batch, macro: bool = False):
    """Device-put a pytree of host arrays with the batch axis sharded.

    macro=True shards axis 1 instead of axis 0 (fused multi-step [K, B, ...]
    macro-batches, where axis 0 is the lax.scan axis).

    Multi-host: each process passes its PER-HOST batch (from a
    process-partitioned ClipLoader) and the global array is assembled from
    the local shards — the global batch dim is per-host-batch x process_count.
    """
    sh = macro_batch_sharding(mesh) if macro else batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch,
        )
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


def time_shard_batch(mesh: Mesh, batch, macro: bool = False):
    """Device-put a pytree of host arrays with the TIME axis sharded.

    Counterpart of shard_batch for long-clip sequence parallelism: frames
    [B, T, H, W, C] and targets [B, T, H, W] shard on axis 1; macro=True
    shards axis 2 of [K, B, T, ...] fused-multi-step macro-batches (axis 0
    is the lax.scan axis, axis 1 the batch).  Single-process only — a
    multi-host time mesh would need cross-host halo exchanges on DCN, which
    is not the design point (SURVEY.md section 2.9)."""
    spec = P(None, None, TIME_AXIS) if macro else P(None, TIME_AXIS)
    sh = NamedSharding(mesh, spec)
    return jax.tree.map(lambda x: jax.device_put(np.asarray(x), sh), batch)
