"""The 2-D formulation of the decoder's 3-D convs is exact (ops/conv2d_path)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sap3d_tpu.ops.conv2d_path import conv3d_via_2d
from sap3d_tpu.ops.layers import ConvNormRelu


def _ref_conv3d(x, kernel, bias, strides):
    y = jax.lax.conv_general_dilated(
        x, kernel, strides, "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y if bias is None else y + bias


@pytest.mark.parametrize(
    "kd,kh,strides,d",
    [
        (3, 3, (1, 1, 1), 8),   # x_1_* / x_2_* sites
        (2, 3, (1, 1, 1), 2),   # x_3_1 site (2,3,3)
        (1, 3, (1, 1, 1), 4),   # degenerate temporal kernel
        (3, 3, (1, 2, 2), 6),   # spatial stride
    ],
)
def test_conv3d_via_2d_matches_xla_3d(kd, kh, strides, d):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, d, 10, 12, 5)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(kd, kh, kh, 5, 7)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(7,)), jnp.float32)
    got = conv3d_via_2d(x, k, b, strides)
    want = _ref_conv3d(x, k, b, strides)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_conv3d_via_2d_rejects_temporal_stride():
    x = jnp.zeros((1, 4, 8, 8, 3))
    k = jnp.zeros((3, 3, 3, 3, 4))
    with pytest.raises(ValueError):
        conv3d_via_2d(x, k, None, (2, 1, 1))


def test_convnormrelu_flag_same_params_same_output():
    """SAP3D_CONV3D_VIA_2D=1 keeps the param tree identical and the output
    equal — checkpoints are interchangeable between the two paths."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 6)), jnp.float32)
    mod = ConvNormRelu(8, 3, 1, norm_mode="gn")
    v = mod.init(jax.random.PRNGKey(0), x, train=True)
    base = mod.apply(v, x, train=True)
    os.environ["SAP3D_CONV3D_VIA_2D"] = "1"
    try:
        v2 = mod.init(jax.random.PRNGKey(0), x, train=True)
        assert jax.tree_util.tree_structure(v2) == \
            jax.tree_util.tree_structure(v)
        assert [p.shape for p in jax.tree_util.tree_leaves(v2)] == \
            [p.shape for p in jax.tree_util.tree_leaves(v)]
        got = mod.apply(v, x, train=True)  # same params through the 2-D path
    finally:
        del os.environ["SAP3D_CONV3D_VIA_2D"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=1e-5, atol=1e-5)
