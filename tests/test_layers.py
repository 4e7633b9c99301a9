"""Unit tests for the core op library (sap3d_tpu/ops/layers.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sap3d_tpu.ops.layers import (
    ConvNormRelu,
    Norm,
    TransposeConvNormRelu,
    max_pool3d,
    pool3d,
    smooth_l1_loss,
    unpool_zero_interleave,
)


def test_max_pool3d_matches_naive():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 6, 6, 3)).astype(np.float32)
    out = max_pool3d(jnp.asarray(x), (2, 3, 3), (2, 2, 2), padding="VALID")
    # naive
    expected = np.full((2, 2, 2, 2, 3), -np.inf, np.float32)
    for d in range(2):
        for i in range(2):
            for j in range(2):
                expected[:, d, i, j] = x[
                    :, 2 * d : 2 * d + 2, 2 * i : 2 * i + 3, 2 * j : 2 * j + 3
                ].max(axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)


def test_max_pool3d_same_shape():
    # The stem pool (2,3,3)/(2,2,2) SAME: 16x112x112 -> 8x56x56
    # (reference p3d.py:177).
    x = jnp.zeros((1, 16, 112, 112, 4))
    assert max_pool3d(x, (2, 3, 3), (2, 2, 2)).shape == (1, 8, 56, 56, 4)
    # temporal pool (2,1,1)/(2,1,1): halves time only (reference p3d.py:183).
    assert max_pool3d(x, (2, 1, 1), (2, 1, 1)).shape == (1, 8, 112, 112, 4)


def test_pool3d_identity_and_cubic():
    x = jnp.arange(2 * 4 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 4, 3)
    assert pool3d(x, 1) is x
    out = pool3d(x, 2)
    assert out.shape == (2, 2, 2, 2, 3)


def test_unpool_zero_interleave():
    x = jnp.ones((1, 2, 2, 2, 3))
    out = unpool_zero_interleave(x)
    assert out.shape == (1, 4, 4, 4, 3)
    # exactly 1/8 of entries nonzero
    assert float(jnp.sum(out)) == pytest.approx(float(jnp.sum(x)))
    assert float(out[0, 0, 0, 0, 0]) == 1.0
    assert float(out[0, 1, 0, 0, 0]) == 0.0


def test_smooth_l1_formula_and_reduction():
    """Oracle transcription of reference utils/network.py:49-62 (sigma=1)."""
    rng = np.random.default_rng(1)
    pred = rng.normal(size=(2, 3, 4, 4)).astype(np.float32) * 2
    tgt = rng.normal(size=(2, 3, 4, 4)).astype(np.float32)

    diff = pred - tgt
    absd = np.abs(diff)
    small = (absd < 1.0).astype(np.float32)
    oracle = np.sum(diff**2 * 0.5 * small + (absd - 0.5) * (1 - small))

    got = smooth_l1_loss(jnp.asarray(pred), jnp.asarray(tgt), 1.0, 1.0, sigma=1.0)
    np.testing.assert_allclose(float(got), oracle, rtol=1e-5)


def test_smooth_l1_gradient_is_clipped():
    # d/dpred of smooth-L1 saturates at +-1 for |diff| >= 1/sigma^2.
    g = jax.grad(lambda p: smooth_l1_loss(p, jnp.zeros(3), sigma=1.0))(
        jnp.array([0.25, 5.0, -5.0])
    )
    np.testing.assert_allclose(np.asarray(g), [0.25, 1.0, -1.0], rtol=1e-6)


def test_groupnorm_matches_manual():
    """GroupNorm parity with reference utils/network.py:65-87 (fresh params:
    gamma=1, beta=0)."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 3, 4, 4, 64)).astype(np.float32)
    m = Norm(mode="gn")
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    out = np.asarray(m.apply(variables, jnp.asarray(x), train=True))

    # manual: groups of C/G channels, moments over (group-channels, D, H, W)
    G, eps = 32, 1e-5
    xr = x.reshape(2, 3, 4, 4, G, 64 // G)
    mean = xr.mean(axis=(1, 2, 3, 5), keepdims=True)
    var = xr.var(axis=(1, 2, 3, 5), keepdims=True)
    expected = ((xr - mean) / np.sqrt(var + eps)).reshape(x.shape)
    np.testing.assert_allclose(out, expected, atol=1e-4)


def test_batchnorm_updates_stats_and_uses_them():
    x = jnp.asarray(
        np.random.default_rng(3).normal(2.0, 3.0, size=(4, 2, 4, 4, 8)),
        jnp.float32,
    )
    m = Norm(mode="bn")
    variables = m.init(jax.random.PRNGKey(0), x, train=True)
    out, mutated = m.apply(variables, x, train=True, mutable=["batch_stats"])
    # train output is standardized per channel
    assert abs(float(out.mean())) < 1e-3
    stats = mutated["batch_stats"]
    leaves = jax.tree.leaves(stats)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)  # stats moved


@pytest.mark.parametrize("mode", ["bn", "gn"])
def test_conv_blocks_shapes(mode):
    x = jnp.zeros((1, 4, 8, 8, 6))
    y = ConvNormRelu(16, 3, 1, norm_mode=mode).init_with_output(
        {"params": jax.random.PRNGKey(0)}, x, train=False
    )[0]
    assert y.shape == (1, 4, 8, 8, 16)
    y = TransposeConvNormRelu(8, (1, 3, 3), 2, norm_mode=mode).init_with_output(
        {"params": jax.random.PRNGKey(0)}, x, train=False
    )[0]
    # SAME transpose conv: output = input * stride (TF parity)
    assert y.shape == (1, 8, 16, 16, 8)
