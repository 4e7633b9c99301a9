"""Concat-split conv schedule (SAP3D_CONCAT_SPLIT=1) equivalence tests.

conv3d(concat(parts, -1), W) must equal sum_i conv3d(parts[i], W_i) exactly
(fp rounding), with an UNCHANGED param tree, at op level and through the
flagship decoder forward + gradients (the sites being optimized,
models/p3d.py:359-384; reference p3d.py:305-330).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sap3d_tpu.ops.concat_split import conv3d_concat_split


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32) * 0.1


@pytest.mark.parametrize("kd,strides", [(3, (1, 1, 1)), (1, (1, 2, 2))])
def test_op_matches_eager_concat(kd, strides):
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    a = _rand(keys[0], (2, 4, 8, 8, 6))
    b = _rand(keys[1], (2, 4, 8, 8, 10))
    kernel = _rand(keys[2], (kd, 3, 3, 16, 12))
    bias = _rand(keys[3], (12,))

    ref = jax.lax.conv_general_dilated(
        jnp.concatenate([a, b], -1), kernel, strides, "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + bias
    got = conv3d_concat_split([a, b], kernel, bias, strides)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_op_rejects_channel_mismatch():
    a = jnp.zeros((1, 2, 4, 4, 3))
    kernel = jnp.zeros((3, 3, 3, 5, 8))
    with pytest.raises(ValueError):
        conv3d_concat_split([a], kernel, None)


def test_flagship_decoder_forward_and_grads_match(monkeypatch):
    """Same params, same batch: flag on == flag off through the full
    unet++ micro model (loss value and parameter gradients)."""
    from sap3d_tpu.models.registry import build_model

    def loss_fn(model, variables, frames, targets):
        out = model.apply(variables, frames, train=False)
        return jnp.mean((out - targets[..., None]) ** 2)

    frames = _rand(jax.random.PRNGKey(1), (2, 16, 16, 16, 3))
    targets = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 16))

    # default is ON since r4 — "0" selects the eager-concat baseline
    monkeypatch.setenv("SAP3D_CONCAT_SPLIT", "0")
    model = build_model("p3d_micro", dtype="float32")
    variables = model.init(jax.random.PRNGKey(0), frames, train=False)
    base_loss, base_grads = jax.value_and_grad(
        lambda v: loss_fn(model, v, frames, targets))(variables)

    monkeypatch.setenv("SAP3D_CONCAT_SPLIT", "1")
    model2 = build_model("p3d_micro", dtype="float32")
    variables2 = model2.init(jax.random.PRNGKey(0), frames, train=False)
    # identical param tree (names AND shapes) -> checkpoints interchange
    assert jax.tree_util.tree_structure(variables2) == \
        jax.tree_util.tree_structure(variables)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 variables, variables2)
    split_loss, split_grads = jax.value_and_grad(
        lambda v: loss_fn(model2, v, frames, targets))(variables)

    np.testing.assert_allclose(float(split_loss), float(base_loss),
                               rtol=0, atol=1e-6)
    flat_a = jax.tree_util.tree_leaves_with_path(base_grads)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(split_grads))
    # dict() keys are the paths; compare every gradient leaf
    for path, ga in flat_a:
        gb = flat_b[path]
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=str(path))


def test_composes_with_via_2d(monkeypatch):
    monkeypatch.setenv("SAP3D_CONCAT_SPLIT", "1")
    monkeypatch.setenv("SAP3D_CONV3D_VIA_2D", "1")
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    a = _rand(keys[0], (2, 4, 8, 8, 6))
    b = _rand(keys[1], (2, 4, 8, 8, 10))
    kernel = _rand(keys[2], (3, 3, 3, 16, 12))
    ref = jax.lax.conv_general_dilated(
        jnp.concatenate([a, b], -1), kernel, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    got = conv3d_concat_split([a, b], kernel, None, (1, 1, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_eager_site_override_matches(monkeypatch):
    """SAP3D_CONCAT_EAGER_SITES forces eager concat at the named sites only:
    same param tree, same forward output as the all-split default."""
    from sap3d_tpu.models.registry import build_model

    frames = _rand(jax.random.PRNGKey(4), (2, 16, 16, 16, 3))

    monkeypatch.setenv("SAP3D_CONCAT_SPLIT", "1")
    monkeypatch.delenv("SAP3D_CONCAT_EAGER_SITES", raising=False)
    model = build_model("p3d_micro", dtype="float32")
    variables = model.init(jax.random.PRNGKey(0), frames, train=False)
    base = model.apply(variables, frames, train=False)

    monkeypatch.setenv("SAP3D_CONCAT_EAGER_SITES", "x_1_1, x_2_1")
    model2 = build_model("p3d_micro", dtype="float32")
    variables2 = model2.init(jax.random.PRNGKey(0), frames, train=False)
    assert jax.tree_util.tree_structure(variables2) == \
        jax.tree_util.tree_structure(variables)
    got = model2.apply(variables, frames, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=0, atol=1e-5)
