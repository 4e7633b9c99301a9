"""Tests for CBAM / SE blocks (sap3d_tpu/ops/cbam.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from sap3d_tpu.ops.cbam import CBAM, ChannelAttention3D, SEBlock3D, SpatialAttention3D


def _run(module, x):
    variables = module.init(jax.random.PRNGKey(0), x)
    return module.apply(variables, x), variables


def test_channel_attention_shared_mlp():
    """avg and max paths share one 2-layer MLP (reference network.py:218-245
    reuses mlp_0/mlp_1)."""
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 2, 4, 4, 16)),
                    jnp.float32)
    out, variables = _run(ChannelAttention3D(ratio=8), x)
    assert out.shape == x.shape
    params = variables["params"]
    assert set(params.keys()) == {"mlp_0", "mlp_1"}  # shared, not duplicated
    assert params["mlp_0"]["kernel"].shape == (16, 2)
    assert params["mlp_1"]["kernel"].shape == (2, 16)


def test_channel_attention_is_bounded_scaling():
    x = jnp.abs(jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 2, 3, 3, 8)), jnp.float32))
    out, _ = _run(ChannelAttention3D(), x)
    # sigmoid scale in (0, 1): |out| <= |x| elementwise for positive x
    assert bool(jnp.all(out <= x + 1e-6))
    assert bool(jnp.all(out >= 0))


def test_spatial_attention_shape_and_kernel():
    x = jnp.zeros((2, 4, 8, 8, 16))
    out, variables = _run(SpatialAttention3D(), x)
    assert out.shape == x.shape
    # 7x7x7 conv over [avg, max] concat, 1 output channel, no bias
    assert variables["params"]["conv3d"]["kernel"].shape == (7, 7, 7, 2, 1)
    assert "bias" not in variables["params"]["conv3d"]


def test_cbam_composition():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 2, 4, 4, 16)),
                    jnp.float32)
    out, variables = _run(CBAM(), x)
    assert out.shape == x.shape
    assert set(variables["params"].keys()) == {"ch_at", "sp_at"}


def test_se_block():
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 2, 4, 4, 16)),
                    jnp.float32)
    out, _ = _run(SEBlock3D(), x)
    assert out.shape == x.shape
