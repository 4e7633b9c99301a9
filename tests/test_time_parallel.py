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


def micro_model(dropout_rate: float = 0.5):
    return P3DSaliency(
        decoder="unetpp",
        decoder_kwargs=dict(attention="sa", head="ds"),
        norm_mode="bn",
        stages=MICRO_STAGES,
        stem_features=8,
        dropout_rate=dropout_rate,
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
    """Backward also works under time sharding (training long clips).

    Tree-wide comparison: temporal-halo bugs would surface in conv kernels
    anywhere in the network, not just in the first leaf.  The check is
    referenced to a float64 oracle so reduction-order noise is measured
    rather than guessed (tests/_asserts.py); dropout is off so the x32 and
    x64 programs compute the same mathematical function.
    """
    from _asserts import assert_grads_match

    model = micro_model(dropout_rate=0.0)
    T = 32
    shape = (1, T, 16, 16, 3)
    state = create_train_state(model, jax.random.PRNGKey(0), input_shape=shape)
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.3)
    targets = jnp.asarray(rng.random(shape[:-1]).astype(np.float32))

    mesh = make_time_mesh(4)
    tsh = time_sharding(mesh)
    repl = NamedSharding(mesh, P())

    def loss(params, f, t):
        out, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats}, f,
            train=True, mutable=["batch_stats"],
        )
        return loss_fn_saliency(out, t)

    g_sh = jax.jit(jax.grad(loss), in_shardings=(repl, tsh, repl))(
        state.params, jax.device_put(frames, tsh), targets
    )
    g_ref = jax.jit(jax.grad(loss))(state.params, frames, targets)
    jax.config.update("jax_enable_x64", True)
    try:
        to64 = lambda t: jax.tree.map(  # noqa: E731
            lambda x: np.asarray(x, np.float64), jax.device_get(t))
        g_hi = jax.jit(jax.grad(loss))(
            to64(state.params), to64(frames), to64(targets)
        )
        g_hi = jax.device_get(g_hi)
    finally:
        jax.config.update("jax_enable_x64", False)
    assert_grads_match(g_sh, g_ref, g_hi)
