"""Tests for self-attention / non-local blocks (sap3d_tpu/ops/attention.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sap3d_tpu.ops.attention import (
    NonLocal3D,
    SelfAttention3D,
    _dot_softmax_attend,
    attend_tokens,
)


def _init_apply(module, x, train=False):
    variables = module.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=train,
    )
    return module.apply(variables, x, train=train), variables


def test_attention_starts_as_identity():
    """gamma is initialized to 0 (reference utils/network.py:191) so the
    block is the identity at init."""
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 2, 4, 4, 16)),
                    jnp.float32)
    out, _ = _init_apply(SelfAttention3D(norm_mode="none"), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_attention_math_oracle():
    """attend_tokens == softmax(q k^T) v computed by hand."""
    rng = np.random.default_rng(1)
    q = rng.normal(size=(2, 5, 3)).astype(np.float32)
    k = rng.normal(size=(2, 7, 3)).astype(np.float32)
    v = rng.normal(size=(2, 7, 4)).astype(np.float32)
    got = np.asarray(
        attend_tokens(*map(jnp.asarray, (q, k, v)),
                      precision=jax.lax.Precision.HIGHEST)
    )
    scores = np.einsum("bqc,bkc->bqk", q, k)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    beta = e / e.sum(-1, keepdims=True)
    expected = np.einsum("bqk,bkc->bqc", beta, v)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_chunked_attention_matches_full():
    """The large-Nq chunked path must agree with direct computation."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 5000, 8)), jnp.float32)  # > threshold
    k = jnp.asarray(rng.normal(size=(1, 64, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 64, 16)), jnp.float32)
    full = _dot_softmax_attend(q, k, v, jax.lax.Precision.HIGHEST)
    chunked = attend_tokens(q, k, v, jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(full), rtol=1e-4, atol=1e-5
    )


def test_chunked_attention_grads_match():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(1, 4200, 4)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 32, 4)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 32, 4)), jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    g1 = jax.grad(lambda a: jnp.sum(_dot_softmax_attend(a, k, v, hp) ** 2))(q)
    g2 = jax.grad(lambda a: jnp.sum(attend_tokens(a, k, v, hp) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3,
                               atol=1e-5)


@pytest.mark.parametrize("subsample,sub_size", [(False, 2), (True, 2), (True, 4)])
def test_attention_preserves_shape(subsample, sub_size):
    """Key/value pooling never changes the output shape (the consistent rule
    derived from the reference's live configs, see ops/attention.py docstring)."""
    x = jnp.zeros((1, 4, 8, 8, 16))
    out, _ = _init_apply(
        SelfAttention3D(norm_mode="none", subsample=subsample, sub_size=sub_size), x
    )
    assert out.shape == x.shape


def test_attention_inter_channels_floor():
    # C < 8 still works: inter = max(1, C//8) (reference network.py:162).
    x = jnp.zeros((1, 2, 4, 4, 4))
    out, variables = _init_apply(SelfAttention3D(norm_mode="none"), x)
    assert variables["params"]["f"]["kernel"].shape[-1] == 1


def test_non_local_shape_and_residual():
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 2, 4, 4, 8)),
                    jnp.float32)
    m = NonLocal3D(sub_sample=True)
    variables = m.init(jax.random.PRNGKey(0), x, train=True)
    out = m.apply(variables, x, train=True, mutable=["batch_stats"])[0]
    assert out.shape == x.shape


def test_non_local_rejects_one_channel():
    x = jnp.zeros((1, 2, 4, 4, 1))
    with pytest.raises(ValueError, match="NonLocal3D needs >=2 channels"):
        NonLocal3D().init(jax.random.PRNGKey(0), x, train=False)


@pytest.mark.parametrize("mode", ["separate", "fused_lowp"])
def test_proj_modes_match_fused(monkeypatch, mode):
    """SAP3D_ATTN_PROJ selects the f/g/h projection schedule only — values
    and gradients must match the fused fp32-accumulator scheme to fp
    rounding, with an identical param tree ("separate" is the r4 default:
    +3.7% inference on v5e, train-neutral; the flag keeps all three
    schemes honest)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 2, 6, 6, 16)).astype(np.float32))
    module = SelfAttention3D(norm_mode="none")

    def run():
        variables = module.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, train=False,
        )
        # gamma=0 makes the block the identity; grads through a non-zero
        # gamma exercise the projection backward
        variables = jax.tree.map(jnp.asarray, variables)
        params = variables["params"] | {"gamma": jnp.ones((1,))}

        def loss(p):
            out = module.apply({**variables, "params": p}, x, train=False)
            return jnp.sum(out**2)

        val, grads = jax.value_and_grad(loss)(params)
        return variables, val, grads

    monkeypatch.setenv("SAP3D_ATTN_PROJ", "fused")
    vars_fused, val_fused, g_fused = run()
    monkeypatch.setenv("SAP3D_ATTN_PROJ", mode)
    vars_mode, val_mode, g_mode = run()

    assert jax.tree.structure(vars_fused) == jax.tree.structure(vars_mode)
    np.testing.assert_allclose(float(val_mode), float(val_fused), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_mode)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
