"""Pallas flash-attention kernel tests (interpret mode on CPU).

On CPU the kernel runs through the Pallas interpreter
(pltpu.force_tpu_interpret_mode) — same program, emulated; the real Mosaic
compile path is exercised by bench.py on TPU hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from sap3d_tpu.ops.attention import _dot_softmax_attend
from sap3d_tpu.ops.pallas.flash_attention import (
    _flash_forward,
    flash_attend_tokens,
    flash_attention_viable,
)


def _ref(q, k, v):
    return _dot_softmax_attend(q, k, v, jax.lax.Precision.HIGHEST)


@pytest.mark.parametrize(
    "b,nq,nk,d,c",
    [
        (1, 256, 64, 8, 16),     # exact block multiple
        (2, 300, 49, 4, 32),     # ragged nq (padding path)
        (1, 512, 100, 2, 8),     # tiny head dim (x_0_1-like)
        (1, 300, 128, 32, 64),   # GN-decoder proportions (d=C//8 wide, r5)
    ],
)
def test_flash_forward_matches_reference(b, nq, nk, d, c):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, nq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, nk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, nk, c)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got, lse = _flash_forward(q, k, v)
    want = _ref(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )
    # lse must be the true per-row log-sum-exp of the scores
    s = np.einsum("bqc,bkc->bqk", np.asarray(q, np.float64),
                  np.asarray(k, np.float64))
    want_lse = np.log(np.exp(s - s.max(-1, keepdims=True)).sum(-1)) + \
        s.max(-1)
    # [b, 8, nq]: sublane-replicated row — a trailing 1-dim would be
    # lane-padded to 128 and a bare (1, BQ) block mis-tiles on hardware
    assert lse.shape == (b, 8, nq)
    np.testing.assert_array_equal(
        np.asarray(lse),
        np.broadcast_to(np.asarray(lse[:, :1]), lse.shape))  # replicated
    np.testing.assert_allclose(np.asarray(lse[:, 0]), want_lse,
                               rtol=1e-4, atol=1e-4)


def test_flash_backward_matches_reference():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 256, 4)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 32, 4)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 32, 8)), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attend_tokens(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v) ** 2)

    # the custom_vjp backward runs during the grad call itself, so the whole
    # call must be under interpret mode
    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-2, atol=1e-4
        )


def test_flash_backward_bf16_matches_reference():
    """bf16 operands exercise the kernel's low-precision matmul path
    (p/ds rounded to bf16 before the MXU, fp32 accumulation)."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 256, 8)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, 32, 8)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, 32, 16)), jnp.bfloat16)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attend_tokens(q, k, v).astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v).astype(jnp.float32) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        gf = np.asarray(gf, np.float32)
        gr = np.asarray(gr, np.float32)
        # bf16 rounding noise scales with the leaf's magnitude
        tol = 0.05 * np.abs(gr).max()
        np.testing.assert_allclose(gf, gr, atol=tol)


def test_viability_heuristic():
    # x_2_2 site bf16: Nq=Nk=3136, d=32, C=256 — should qualify
    assert flash_attention_viable(3136, 3136, 32, 256, itemsize=2)
    # x_4_0 site: Nq=49 < one block — not worth a kernel launch
    assert not flash_attention_viable(49, 49, 128, 1024)
    # absurd C blows the VMEM budget
    assert not flash_attention_viable(100000, 50000, 128, 4096)


def test_flash_lse_vjp_matches_reference():
    """flash_attend_tokens_lse: gradients must be correct when the loss
    consumes BOTH outputs (o and lse) — the ring-hop merge does exactly
    that (ops/ring_attention.py), so the lse cotangent path (+p*dlse in
    the backward kernel) is load-bearing."""
    from sap3d_tpu.ops.pallas.flash_attention import flash_attend_tokens_lse

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(2, 300, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 32, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 32, 16)), jnp.float32)

    def loss_flash(q, k, v):
        o, lse = flash_attend_tokens_lse(q, k, v)
        return jnp.sum(o ** 2) + jnp.sum(jnp.cos(lse[:, 0]))

    def loss_ref(q, k, v):
        o = _ref(q, k, v)
        s = jnp.einsum("bqd,bkd->bqk", q, k,
                       precision=jax.lax.Precision.HIGHEST)
        lse = jax.nn.logsumexp(s, axis=-1)
        return jnp.sum(o ** 2) + jnp.sum(jnp.cos(lse))

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-2, atol=2e-4
        )


def test_flash_primal_nolse_matches_reference():
    """The inference path (custom_vjp primal, no differentiation) uses the
    lse-free kernel; it must produce the same output as the lse variant."""
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(2, 300, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 49, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 49, 16)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attend_tokens(q, k, v)  # primal body -> want_lse=False
        nolse, none_lse = _flash_forward(q, k, v, want_lse=False)
    assert none_lse is None
    want = _ref(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nolse), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_viability_asymmetric_gate(monkeypatch):
    """The gate is asymmetric by measurement (v5e 2026-08-20, BASELINE.md
    round 5 part C): at the GN decoder sites (nq=nk=6272, d=32..128,
    c=256..1024, bf16) the flash FORWARD wins +10.5% whole-model inference
    but the flash BACKWARD loses 33% at train — so training keeps the
    flagship-tuned budgets and inference admits the wider shapes by
    default.  SAP3D_FLASH_VMEM_MB still widens the training gate for
    A/B re-measurement."""
    gn_sites = [(6272, 6272, 32, 256), (6272, 6272, 64, 512),
                (6272, 6272, 128, 1024)]
    monkeypatch.delenv("SAP3D_FLASH_VMEM_MB", raising=False)
    for nq, nk, d, c in gn_sites:
        assert not flash_attention_viable(nq, nk, d, c, itemsize=2)
        assert flash_attention_viable(nq, nk, d, c, itemsize=2,
                                      training=False), (nq, d, c)
    # flagship-sized site passes both gates
    assert flash_attention_viable(4096, 392, 16, 128, itemsize=2)
    monkeypatch.setenv("SAP3D_FLASH_VMEM_MB", "56")
    for nq, nk, d, c in gn_sites:
        assert flash_attention_viable(nq, nk, d, c, itemsize=2), (nq, d, c)


def test_hybrid_fwd_chunked_bwd_matches_reference():
    """flash_fwd_chunked_bwd (the GN-site train hybrid): Pallas forward +
    chunked-XLA recompute backward must match the reference on both the
    output and all three gradients."""
    from sap3d_tpu.ops.pallas.flash_attention import flash_fwd_chunked_bwd

    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(2, 300, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 49, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 49, 16)), jnp.float32)

    def loss_hybrid(q, k, v):
        return jnp.sum(flash_fwd_chunked_bwd(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v) ** 2)

    with pltpu.force_tpu_interpret_mode():
        out = flash_fwd_chunked_bwd(q, k, v)
        g_hybrid = jax.grad(loss_hybrid, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(q, k, v)),
                               rtol=1e-4, atol=1e-5)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gh, gr in zip(g_hybrid, g_ref):
        np.testing.assert_allclose(np.asarray(gh), np.asarray(gr),
                                   rtol=2e-3, atol=1e-5)
