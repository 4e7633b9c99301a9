"""FastConvTranspose must equal nn.ConvTranspose exactly (same params)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from sap3d_tpu.ops.fast_tconv import FastConvTranspose

# every (kernel, stride) configuration the model family uses
CONFIGS = [
    ((3, 3, 3), (2, 2, 2)),   # most up-convs
    ((1, 3, 3), (2, 2, 2)),   # upx_4_0 / deconv1
    ((2, 3, 3), (2, 2, 2)),   # upx_3_0 / upx_3_1 / deconv2
    ((3, 3, 3), (4, 4, 4)),   # GN deconv_pool4
    ((3, 3, 3), (1, 1, 1)),   # GN deconv_pool2 (stride 1)
    ((2, 3, 3), (1, 2, 2)),   # mixed strides
]


@pytest.mark.parametrize("kernel,strides", CONFIGS)
@pytest.mark.parametrize("use_bias", [True, False])
def test_matches_conv_transpose(kernel, strides, use_bias):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 6, 5, 7)), jnp.float32)
    ref = nn.ConvTranspose(3, kernel, strides=strides, padding="SAME",
                           use_bias=use_bias)
    fast = FastConvTranspose(3, kernel, strides, use_bias=use_bias)
    v = ref.init(jax.random.PRNGKey(1), x)
    # identical parameter trees -> checkpoints interchange freely
    v2 = fast.init(jax.random.PRNGKey(1), x)
    assert jax.tree.map(jnp.shape, v) == jax.tree.map(jnp.shape, v2)

    want = ref.apply(v, x)
    got = fast.apply(v, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_gradients_match():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 6)), jnp.float32)
    ref = nn.ConvTranspose(4, (3, 3, 3), strides=(2, 2, 2), padding="SAME")
    fast = FastConvTranspose(4, (3, 3, 3), (2, 2, 2))
    v = ref.init(jax.random.PRNGKey(0), x)

    def loss(mod, v, x):
        return jnp.sum(mod.apply(v, x) ** 2)

    g_ref = jax.grad(lambda v: loss(ref, v, x))(v)
    g_fast = jax.grad(lambda v: loss(fast, v, x))(v)
    for a, b in zip(jax.tree.leaves(g_fast), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
