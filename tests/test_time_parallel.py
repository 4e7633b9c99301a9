"""Long-clip sequence parallelism: time-axis sharding over the mesh.

The reference has no sequence scaling — clips are fixed at 16 frames and the
time axis shrinks inside the net (SURVEY.md section 2.9).  Here a 64-frame
clip is sharded over 4 devices on the temporal axis; GSPMD partitions the
temporal convs/pools (halo exchanges) and gathers for the global attention.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from sap3d_tpu.core.mesh import make_time_mesh, time_sharding
from sap3d_tpu.models.p3d import P3DSaliency
from sap3d_tpu.train.state import create_train_state
from sap3d_tpu.train.steps import loss_fn_saliency

MICRO_STAGES = ((8, 1), (16, 1), (32, 1))


def micro_model():
    return P3DSaliency(
        decoder="unetpp",
        decoder_kwargs=dict(attention="sa", head="ds"),
        norm_mode="bn",
        stages=MICRO_STAGES,
        stem_features=8,
    )


def test_time_sharded_long_clip_matches_replicated():
    model = micro_model()
    T = 64  # 4x the reference clip length
    shape = (1, T, 16, 16, 3)
    state = create_train_state(model, jax.random.PRNGKey(0), input_shape=shape)
    frames = jnp.asarray(
        np.random.default_rng(0).normal(size=shape).astype(np.float32) * 0.3
    )

    mesh = make_time_mesh(4)
    tsh = time_sharding(mesh)
    repl = NamedSharding(mesh, P())

    def forward(s, f):
        return model.apply(
            {"params": s.params, "batch_stats": s.batch_stats}, f, train=False
        )

    sharded = jax.jit(forward, in_shardings=(repl, tsh))(
        state, jax.device_put(frames, tsh)
    )
    ref = jax.jit(forward)(state, frames)
    assert sharded.shape == (1, T, 16, 16, 1)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(ref), atol=1e-5
    )


def test_time_sharded_gradients():
    """Backward also works under time sharding (training long clips)."""
    model = micro_model()
    T = 32
    shape = (1, T, 16, 16, 3)
    state = create_train_state(model, jax.random.PRNGKey(0), input_shape=shape)
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.3)
    targets = jnp.asarray(rng.random(shape[:-1]).astype(np.float32))

    mesh = make_time_mesh(4)
    tsh = time_sharding(mesh)
    repl = NamedSharding(mesh, P())

    def loss(params, f):
        out, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats}, f,
            train=True, rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        return loss_fn_saliency(out, targets)

    g_sh = jax.jit(jax.grad(loss), in_shardings=(repl, tsh))(
        state.params, jax.device_put(frames, tsh)
    )
    g_ref = jax.jit(jax.grad(loss))(state.params, frames)
    a = jax.tree.leaves(g_sh)[0]
    b = jax.tree.leaves(g_ref)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                               atol=1e-4)
