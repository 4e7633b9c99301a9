"""Multi-device data-parallel tests on the 8-device virtual CPU mesh.

(The standard TPU-less sharding test setup — conftest.py forces
xla_force_host_platform_device_count=8.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sap3d_tpu.core.mesh import batch_sharding, make_mesh, shard_batch
from sap3d_tpu.models.p3d import P3DSaliency
from sap3d_tpu.train.state import create_train_state
from sap3d_tpu.train.steps import make_eval_step, make_train_step

MICRO_STAGES = ((8, 1), (16, 1), (32, 1))
SHAPE = (8, 16, 16, 16, 3)  # batch 8 across 8 devices


def micro_model():
    return P3DSaliency(
        decoder="unetpp",
        decoder_kwargs=dict(attention="sa", head="ds"),
        norm_mode="bn",
        stages=MICRO_STAGES,
        stem_features=8,
    )


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    frames = rng.normal(size=SHAPE).astype(np.float32) * 0.3
    targets = (frames[..., 2] > 0.2).astype(np.float32)
    return frames, targets


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_train_step_runs(batch):
    frames, targets = batch
    mesh = make_mesh()
    model = micro_model()
    state = create_train_state(model, jax.random.PRNGKey(0), input_shape=SHAPE)
    step = make_train_step(model, mesh=mesh, donate=False)
    f, t = shard_batch(mesh, (jnp.asarray(frames), jnp.asarray(targets)))
    assert f.sharding == batch_sharding(mesh)
    state, loss = step(state, f, t, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    state, loss2 = step(state, f, t, jax.random.PRNGKey(1))
    assert float(loss2) != float(loss)


def test_dp_matches_single_device(batch):
    """The global sum-reduced loss trajectory must match between a 1-device
    and an 8-device run (same data, same rngs).

    Exact parameter equality is NOT expected: the sharded gradient is reduced
    in a different floating-point order, and Adam's first-step update is
    ~lr*sign(grad), so near-zero gradients can flip sign.  Agreement of the
    global loss across two steps is the meaningful semantic check (dropout
    masks are identical: same key, same global shapes).
    """
    frames, targets = batch

    def run_two_steps(mesh):
        model = micro_model()
        state = create_train_state(model, jax.random.PRNGKey(0), input_shape=SHAPE)
        step = make_train_step(model, mesh=mesh, donate=False)
        f, t = jnp.asarray(frames), jnp.asarray(targets)
        if mesh is not None:
            f, t = shard_batch(mesh, (f, t))
        losses = []
        for i in range(2):
            state, loss = step(state, f, t, jax.random.PRNGKey(9 + i))
            losses.append(float(loss))
        return losses

    losses1 = run_two_steps(None)
    losses8 = run_two_steps(make_mesh())
    np.testing.assert_allclose(losses1, losses8, rtol=1e-3)


def test_fused_multi_step_sharded_k_not_divisible(batch):
    """The fused-K macro-batch [K, B, ...] must shard axis 1 (batch), never
    the scan axis: with K=3 on 8 devices a P('data') put would crash
    (3 % 8 != 0) or silently reshard every call."""
    from sap3d_tpu.core.mesh import macro_batch_sharding
    from sap3d_tpu.train.steps import make_multi_train_step

    frames, targets = batch
    k = 3
    mf = np.stack([frames] * k)  # [K, B, ...]
    mt = np.stack([targets] * k)
    mesh = make_mesh()
    model = micro_model()
    state = create_train_state(model, jax.random.PRNGKey(0), input_shape=SHAPE)
    multi = make_multi_train_step(model, k, mesh=mesh, donate=False)
    f, t = shard_batch(mesh, (jnp.asarray(mf), jnp.asarray(mt)), macro=True)
    assert f.sharding == macro_batch_sharding(mesh)
    state, losses = multi(state, f, t, jax.random.PRNGKey(0))
    losses = np.asarray(losses)
    assert losses.shape == (k,)
    assert np.isfinite(losses).all()


def test_sharded_eval_step(batch):
    frames, _ = batch
    mesh = make_mesh()
    model = micro_model()
    state = create_train_state(model, jax.random.PRNGKey(0), input_shape=SHAPE)
    ev = make_eval_step(model, mesh=mesh)
    f = shard_batch(mesh, jnp.asarray(frames))
    pred = ev(state, f)
    assert pred.shape == (8, 16, 16, 16)
    assert np.isfinite(np.asarray(pred)).all()
    # data-parallel eval must match the single-device eval step exactly
    # (the cmd_eval mesh path, cli.py): same params, replicated; only the
    # batch is split, and inference BN uses running stats (no batch
    # cross-talk), so per-clip outputs are device-placement-invariant.
    ev1 = make_eval_step(model)
    pred1 = ev1(state, jnp.asarray(frames))
    np.testing.assert_allclose(
        np.asarray(pred), np.asarray(pred1), atol=1e-5
    )
