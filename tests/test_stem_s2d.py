"""Space-to-depth stem (SAP3D_STEM_S2D=1) equivalence tests.

conv_stem_s2d must equal the plain stride-(1,2,2) SAME conv exactly (fp
rounding) — op level, gradients, and through the encoder with an UNCHANGED
param tree (the stem being optimized, models/p3d.py P3DEncoder; reference
p3d.py:172).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sap3d_tpu.ops.stem_s2d import StemConv, conv_stem_s2d


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32) * 0.1


def _ref_conv(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 2, 2), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


@pytest.mark.parametrize("k,h,w", [(7, 112, 112), (7, 16, 24), (5, 16, 16),
                                   (4, 16, 16), (3, 8, 12)])
def test_op_matches_plain_conv(k, h, w):
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    x = _rand(keys[0], (2, 3, h, w, 3))
    kernel = _rand(keys[1], (1, k, k, 3, 8))
    np.testing.assert_allclose(
        np.asarray(conv_stem_s2d(x, kernel)),
        np.asarray(_ref_conv(x, kernel)),
        rtol=0, atol=1e-5,
    )


def test_op_grads_match():
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    x = _rand(keys[0], (1, 2, 16, 16, 3))
    kernel = _rand(keys[1], (1, 7, 7, 3, 4))

    def loss(fn, x, kernel):
        return jnp.sum(fn(x, kernel) ** 2)

    gx_s, gk_s = jax.grad(lambda x, k: loss(conv_stem_s2d, x, k), (0, 1))(
        x, kernel)
    gx_r, gk_r = jax.grad(lambda x, k: loss(_ref_conv, x, k), (0, 1))(
        x, kernel)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk_s), np.asarray(gk_r),
                               rtol=0, atol=1e-5)


def test_op_rejects_bad_shapes():
    x = jnp.zeros((1, 2, 15, 16, 3))
    with pytest.raises(ValueError):
        conv_stem_s2d(x, jnp.zeros((1, 7, 7, 3, 4)))
    with pytest.raises(ValueError):
        conv_stem_s2d(jnp.zeros((1, 2, 16, 16, 3)), jnp.zeros((3, 7, 7, 3, 4)))


def test_module_param_tree_and_dispatch(monkeypatch):
    """Same params either way; flag on == flag off; odd inputs fall back."""
    x = _rand(jax.random.PRNGKey(2), (1, 2, 16, 16, 3))
    mod = StemConv(8, kernel_hw=7)
    monkeypatch.setenv("SAP3D_STEM_S2D", "0")
    variables = mod.init(jax.random.PRNGKey(3), x)
    assert set(variables["params"]) == {"kernel"}
    assert variables["params"]["kernel"].shape == (1, 7, 7, 3, 8)
    off = mod.apply(variables, x)
    monkeypatch.setenv("SAP3D_STEM_S2D", "1")
    on = mod.apply(variables, x)
    np.testing.assert_allclose(np.asarray(on), np.asarray(off),
                               rtol=0, atol=1e-5)
    # odd spatial size: silently uses the plain path (same answer trivially)
    x_odd = _rand(jax.random.PRNGKey(4), (1, 2, 15, 16, 3))
    np.testing.assert_allclose(
        np.asarray(mod.apply(variables, x_odd)),
        np.asarray(_ref_conv(x_odd, variables["params"]["kernel"])),
        rtol=0, atol=1e-5,
    )


def test_flagship_model_forward_and_grads_match(monkeypatch):
    """Same params, same batch through the unet++ micro model: stem-s2d and
    head-phase-tconv flags change nothing but the schedule."""
    from sap3d_tpu.models.registry import build_model

    def loss_fn(model, variables, frames, targets):
        out = model.apply(variables, frames, train=False)
        return jnp.mean((out - targets[..., None]) ** 2)

    frames = _rand(jax.random.PRNGKey(5), (2, 16, 16, 16, 3))
    targets = jax.random.uniform(jax.random.PRNGKey(6), (2, 16, 16, 16))

    monkeypatch.setenv("SAP3D_STEM_S2D", "0")
    monkeypatch.setenv("SAP3D_HEAD_TCONV_PS", "0")
    model = build_model("p3d_micro", dtype="float32")
    variables = model.init(jax.random.PRNGKey(7), frames, train=False)
    loss_off, grads_off = jax.value_and_grad(
        lambda v: loss_fn(model, v, frames, targets))(variables)

    monkeypatch.setenv("SAP3D_STEM_S2D", "1")
    monkeypatch.setenv("SAP3D_HEAD_TCONV_PS", "1")
    model_on = build_model("p3d_micro", dtype="float32")
    variables_on = model_on.init(jax.random.PRNGKey(7), frames, train=False)
    # identical param tree (names AND shapes) -> checkpoints interchange
    assert jax.tree_util.tree_structure(variables_on) == \
        jax.tree_util.tree_structure(variables)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 variables, variables_on)
    loss_on, grads_on = jax.value_and_grad(
        lambda v: loss_fn(model_on, v, frames, targets))(variables)

    np.testing.assert_allclose(float(loss_on), float(loss_off),
                               rtol=1e-5, atol=1e-6)
    flat_off = jax.tree_util.tree_leaves_with_path(grads_off)
    flat_on = {jax.tree_util.keystr(p): v
               for p, v in jax.tree_util.tree_leaves_with_path(grads_on)}
    assert len(flat_off) == len(flat_on)
    for path, v_off in flat_off:
        np.testing.assert_allclose(
            np.asarray(flat_on[jax.tree_util.keystr(path)]),
            np.asarray(v_off), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )
