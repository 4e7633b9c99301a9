"""Hybrid data+tensor parallel tests on a 2x4 virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from sap3d_tpu.core.sharding_rules import (
    MODEL_AXIS,
    apply_state_sharding,
    infer_param_specs,
    make_mesh_2d,
    state_shardings,
)
from sap3d_tpu.models.p3d import P3DSaliency
from sap3d_tpu.train.state import create_train_state
from sap3d_tpu.train.steps import make_train_step

# wide enough that stage-3 kernels (32*4=128 features) pass min_features
MICRO_STAGES = ((8, 1), (16, 1), (32, 1))
SHAPE = (4, 16, 16, 16, 3)


def micro_model(dropout_rate: float = 0.5):
    return P3DSaliency(
        decoder="unetpp",
        decoder_kwargs=dict(attention="sa", head="ds"),
        norm_mode="bn",
        stages=MICRO_STAGES,
        stem_features=8,
        dropout_rate=dropout_rate,
    )


@pytest.fixture(scope="module")
def setup():
    mesh = make_mesh_2d(2, 4)
    model = micro_model()
    state = create_train_state(model, jax.random.PRNGKey(0), input_shape=SHAPE)
    return mesh, model, state


def test_gn_cbam_tp_step_matches_replicated():
    """The GN+CBAM family (the 'sap3d' signature models) also trains under
    hybrid DP x TP: spec inference must handle GroupNorm scales and the CBAM
    MLP/conv kernels, and the sharded loss must match the replicated step."""
    mesh = make_mesh_2d(2, 4)
    model = P3DSaliency(
        decoder="gn_easy", norm_mode="gn", backbone_cbam=True,
        stages=MICRO_STAGES, stem_features=8,
    )
    state = create_train_state(model, jax.random.PRNGKey(0), input_shape=SHAPE)
    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.normal(size=SHAPE).astype(np.float32) * 0.3)
    targets = jnp.asarray(rng.random(SHAPE[:-1]).astype(np.float32))
    key = jax.random.PRNGKey(5)

    step_ref = make_train_step(model, donate=False)
    _, loss_ref = step_ref(state, frames, targets, key)

    shardings = state_shardings(state, mesh, min_features=128)
    state_tp = apply_state_sharding(state, shardings)
    assert any(
        not p.sharding.is_fully_replicated
        for p in jax.tree.leaves(state_tp.params)
    )
    step_tp = make_train_step(
        model, mesh=mesh, donate=False, state_sharding=shardings
    )
    _, loss_tp = step_tp(state_tp, frames, targets, key)
    np.testing.assert_allclose(float(loss_tp), float(loss_ref), rtol=2e-4)


def test_infer_param_specs(setup):
    mesh, _, state = setup
    specs = infer_param_specs(state.params, mesh, min_features=128)
    leaves = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    sharded = [s for s in leaves if s != P()]
    assert sharded, "expected at least one sharded kernel"
    for s in sharded:
        assert s[-1] == MODEL_AXIS


def test_tp_train_step_runs_and_matches(setup):
    """A hybrid DP(2) x TP(4) train step runs and its loss matches the
    replicated single-device step."""
    mesh, model, state = setup
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=SHAPE).astype(np.float32) * 0.3)
    targets = jnp.asarray((rng.random(SHAPE[:-1]) > 0.5).astype(np.float32))
    key = jax.random.PRNGKey(7)

    # replicated single-device reference
    step_ref = make_train_step(model, donate=False)
    state_ref, loss_ref = step_ref(state, frames, targets, key)

    shardings = state_shardings(state, mesh, min_features=128)
    state_tp = apply_state_sharding(state, shardings)
    # the wide kernels are actually distributed
    wide = [
        p for p in jax.tree.leaves(state_tp.params)
        if p.ndim >= 2 and p.shape[-1] >= 128
    ]
    assert any(not w.sharding.is_fully_replicated for w in wide)

    step_tp = make_train_step(
        model, mesh=mesh, donate=False, state_sharding=shardings
    )
    state_tp, loss_tp = step_tp(state_tp, frames, targets, key)
    np.testing.assert_allclose(float(loss_tp), float(loss_ref), rtol=1e-4)

    # params stay sharded after the update (moments too)
    wide_after = [
        p for p in jax.tree.leaves(state_tp.params)
        if p.ndim >= 2 and p.shape[-1] >= 128
    ]
    assert any(not w.sharding.is_fully_replicated for w in wide_after)

    # tree-wide GRADIENT parity between the hybrid-sharded and replicated
    # programs (strictly stronger than post-Adam params, which carry ~one
    # bit per element), referenced to a float64 oracle of the same function
    # so reduction-order noise is measured, not guessed (tests/_asserts.py).
    # Dropout is off for this check so the x32 and x64 programs compute the
    # same mathematical function (random bits differ across float widths);
    # the full train step WITH dropout is loss-parity-checked above.
    from jax.sharding import NamedSharding

    from _asserts import assert_grads_match
    from sap3d_tpu.train.steps import loss_fn_saliency

    nodrop = micro_model(dropout_rate=0.0)

    def loss_of(params, f, t):
        out, _ = nodrop.apply(
            {"params": params, "batch_stats": state.batch_stats}, f,
            train=True, mutable=["batch_stats"],
        )
        return loss_fn_saliency(out, t)

    data_sh = NamedSharding(mesh, P("data"))
    g_ref = jax.jit(jax.grad(loss_of))(state.params, frames, targets)
    g_tp = jax.jit(
        jax.grad(loss_of), in_shardings=(shardings.params, data_sh, data_sh)
    )(apply_state_sharding(state, shardings).params,
      jax.device_put(frames, data_sh), jax.device_put(targets, data_sh))
    jax.config.update("jax_enable_x64", True)
    try:
        to64 = lambda t: jax.tree.map(  # noqa: E731
            lambda x: np.asarray(x, np.float64), jax.device_get(t))
        g_hi = jax.jit(jax.grad(loss_of))(
            to64(state.params), to64(frames), to64(targets)
        )
        g_hi = jax.device_get(g_hi)
    finally:
        jax.config.update("jax_enable_x64", False)
    assert_grads_match(g_tp, g_ref, g_hi)
