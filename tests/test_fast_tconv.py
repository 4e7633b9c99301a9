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


def test_phase_pre_interleave_and_s2d_roundtrip():
    """phase layout + space_to_depth3d(target) index exactly the same
    (pred, target) pairs as the interleaved tconv against the raw target."""
    from sap3d_tpu.ops.fast_tconv import (
        phase_tconv_pre_interleave,
        space_to_depth3d,
    )

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    x = jax.random.normal(ks[0], (2, 4, 6, 6, 5), jnp.float32)
    kernel = jax.random.normal(ks[1], (3, 3, 3, 5, 1), jnp.float32) * 0.2
    t = jax.random.uniform(ks[2], (2, 8, 12, 12))

    inter = jax.lax.conv_transpose(
        x, kernel, strides=(2, 2, 2), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        transpose_kernel=False,
    )
    phase = phase_tconv_pre_interleave(x, kernel, (2, 2, 2))
    t_ph = space_to_depth3d(t, (2, 2, 2))
    assert phase.shape == t_ph.shape
    # pair-wise identity: every (pred, target) pair appears in both layouts
    diff_inter = np.sort(np.asarray(inter[..., 0] - t).ravel())
    diff_phase = np.sort(np.asarray(phase - t_ph).ravel())
    np.testing.assert_allclose(diff_phase, diff_inter, rtol=0, atol=1e-5)


def test_phase_head_loss_grads_match(monkeypatch):
    """SAP3D_HEAD_PHASE_LOSS: identical param tree, loss, and gradients on
    the micro flagship (the permutation-invariance claim, end to end)."""
    from sap3d_tpu.models.registry import build_model
    from sap3d_tpu.train.steps import loss_fn_saliency

    frames = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 16, 3),
                               jnp.float32) * 0.3
    targets = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 16))
    drop = jax.random.PRNGKey(3)

    def loss_of(model, variables, params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            frames, train=True, rngs={"dropout": drop},
            mutable=["batch_stats"],
        )
        return loss_fn_saliency(out, targets)

    # pin the interleaved leg explicitly (the flag defaults ON since r5)
    monkeypatch.setenv("SAP3D_HEAD_PHASE_LOSS", "0")
    model = build_model("p3d_micro", dtype="float32")
    variables = model.init(jax.random.PRNGKey(0), frames, train=False)
    base_loss, base_grads = jax.value_and_grad(
        lambda p: loss_of(model, variables, p))(variables["params"])

    monkeypatch.setenv("SAP3D_HEAD_PHASE_LOSS", "1")
    model2 = build_model("p3d_micro", dtype="float32")
    variables2 = model2.init(jax.random.PRNGKey(0), frames, train=False)
    # init runs train=False -> standard head; param tree identical
    assert jax.tree_util.tree_structure(variables2) == \
        jax.tree_util.tree_structure(variables)
    ph_loss, ph_grads = jax.value_and_grad(
        lambda p: loss_of(model2, variables, p))(variables["params"])

    # sum-reduced loss over ~8k terms: different summation order -> fp
    # reassociation at the 1e-6 relative level
    np.testing.assert_allclose(float(ph_loss), float(base_loss),
                               rtol=1e-5, atol=0)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(ph_grads))
    for path, ga in jax.tree_util.tree_leaves_with_path(base_grads):
        # same math, different reduction order: fp divergence compounds
        # through 50+ backward layers — observed up to ~5e-4 relative on
        # isolated small-magnitude stem-kernel elements
        np.testing.assert_allclose(np.asarray(flat_b[path]), np.asarray(ga),
                                   rtol=2e-3, atol=1e-4, err_msg=str(path))
