"""Parameter sharding rules for hybrid data+tensor parallelism.

The reference has no distributed story (SURVEY.md section 2.9); data
parallelism is the primary scaling axis here.  For models whose wide layers
merit it (the 1024-channel stage-3 convs and decoder heads), this module adds
optional tensor parallelism the GSPMD way: annotate the parameter shardings,
let XLA propagate through the graph and insert the collectives.

Rules (deliberately simple):
  * conv / dense kernels whose output-feature (last) dim is >= min_features
    and divisible by the 'model' axis size are sharded on that dim;
  * their biases and norm scales stay replicated (small);
  * everything else is replicated.

Use: specs = infer_param_specs(params, mesh); shardings = to_shardings(...);
pass as the state sharding of a jitted step.  No model-code changes — the
annotations ride on the pytree.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh_2d(n_data: int, n_model: int, devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    assert len(devs) >= n_data * n_model, (
        f"need {n_data * n_model} devices, have {len(devs)}"
    )
    arr = np.array(devs[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def infer_param_specs(params, mesh: Mesh, min_features: int = 512):
    """PartitionSpec pytree: wide kernel output-feature dims -> MODEL_AXIS."""
    if MODEL_AXIS not in mesh.axis_names:
        return jax.tree.map(lambda _: P(), params)
    m = mesh.shape[MODEL_AXIS]

    def spec_of(path, leaf):
        name = str(path[-1].key) if hasattr(path[-1], "key") else ""
        if (
            name == "kernel"
            and leaf.ndim >= 2
            and leaf.shape[-1] >= min_features
            and leaf.shape[-1] % m == 0
        ):
            return P(*([None] * (leaf.ndim - 1)), MODEL_AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(spec_of, params)


def state_shardings(state, mesh: Mesh, min_features: int = 512):
    """NamedSharding pytree for a TrainState: params (and their Adam moments)
    follow infer_param_specs; everything else is replicated.

    Moments are matched by shape: any optimizer-state leaf with the exact
    shape of a sharded parameter gets that parameter's sharding (optax's
    mu/nu mirror the param tree leaf-for-leaf in tree order).
    """
    import optax

    param_specs = infer_param_specs(state.params, mesh, min_features)
    params_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), param_specs)
    repl = NamedSharding(mesh, P())

    def map_opt(o):
        if isinstance(o, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(count=repl, mu=params_sh, nu=params_sh)
        return jax.tree.map(lambda _: repl, o)

    if isinstance(state.opt_state, tuple):
        opt_sh = tuple(map_opt(o) for o in state.opt_state)
    else:
        opt_sh = map_opt(state.opt_state)

    return state.replace(
        step=repl,
        params=params_sh,
        batch_stats=jax.tree.map(lambda _: repl, state.batch_stats),
        opt_state=opt_sh,
    )


def apply_state_sharding(state, shardings):
    """device_put every leaf of the train state onto its sharding."""
    return jax.tree.map(jax.device_put, state, shardings)
