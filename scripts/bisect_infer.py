"""Bisect the round-2 inference regression (535 -> 517 clips/s).

Times the flagship forward under: (1) current code, (2) a monkeypatched
lse-free Pallas forward (the round-1 kernel interface: no lse output, no
log per row), (3) XLA attention, (4) isolated fused-vs-separate f/g/h
projection GEMMs at the x_1_3 site.  Chained N-differencing throughout.
"""

import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np

from sap3d_tpu.models.registry import build_model
from sap3d_tpu.train.state import create_train_state


def chained(step, x0, n_small=4, n_large=14, extra=()):
    def run(n):
        x = x0
        out = None
        for _ in range(n):
            out = step(*extra, x)
            # dependency only: fold a scalar of the output back into the
            # input.  * 1e-12, not * 0 — zero lets XLA fold the term away
            # and the iterations lose their data dependency (bench.py)
            x = x0 + jnp.sum(out.astype(jnp.float32)).astype(x0.dtype) * 1e-12
        return float(jnp.sum(out.astype(jnp.float32)).block_until_ready())

    run(2)
    t0 = time.perf_counter(); run(n_small); ts = time.perf_counter() - t0
    t0 = time.perf_counter(); run(n_large); tl = time.perf_counter() - t0
    return (tl - ts) / (n_large - n_small) * 1e3


def forward_ms(batch=16):
    model = build_model("p3d_unetplusplus_ds", dtype="bfloat16")
    shape = (batch, 16, 112, 112, 3)
    frames = jnp.asarray(
        np.random.default_rng(0).normal(size=shape).astype(np.float32) * 0.3
    )
    state = create_train_state(model, jax.random.PRNGKey(0), input_shape=shape)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # variables passed as an ARGUMENT: closed-over arrays become HLO
    # constants, which the tunneled remote compiler rejects (HTTP 413).
    @jax.jit
    def fwd(v, f):
        return jnp.squeeze(model.apply(v, f, train=False), -1)

    return chained(fwd, frames, extra=(variables,))


def main():
    import sap3d_tpu.ops.pallas.flash_attention as fa

    ms = forward_ms()
    print(f"current fwd: {ms:.2f} ms/batch16 = {16 / ms * 1e3:.1f} clips/s")

    # lse-free round-1-style forward: reuse _flash_forward but drop the lse
    # plumbing by calling the kernel without custom_vjp (inference only)
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _fwd_kernel_nolse(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[0] = o.astype(o_ref.dtype)

    def flash_nolse(q, k, v):
        b, nq, d = q.shape
        _, nk, c = v.shape
        BQ = fa.BLOCK_Q
        pad = (-nq) % BQ
        if pad:
            q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        nq_p = q.shape[1]
        out = pl.pallas_call(
            _fwd_kernel_nolse,
            out_shape=jax.ShapeDtypeStruct((b, nq_p, c), v.dtype),
            grid=(b, nq_p // BQ),
            in_specs=[
                pl.BlockSpec((1, BQ, d), lambda bi, qi: (bi, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nk, d), lambda bi, qi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nk, c), lambda bi, qi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BQ, c), lambda bi, qi: (bi, qi, 0),
                                   memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * nq_p * nk * (d + c),
                bytes_accessed=(q.size + k.size + v.size + b * nq_p * c) * 4,
                transcendentals=b * nq_p * nk,
            ),
        )(q, k, v)
        return out[:, :nq]

    orig = fa.flash_attend_tokens
    fa.flash_attend_tokens = flash_nolse
    try:
        ms = forward_ms()
        print(f"lse-free fwd kernel: {ms:.2f} ms = {16 / ms * 1e3:.1f} clips/s")
    finally:
        fa.flash_attend_tokens = orig

    import os

    os.environ["SAP3D_DISABLE_PALLAS"] = "1"
    try:
        ms = forward_ms()
        print(f"XLA attention fwd: {ms:.2f} ms = {16 / ms * 1e3:.1f} clips/s")
    finally:
        del os.environ["SAP3D_DISABLE_PALLAS"]

    # isolated projection GEMM comparison at x_1_3: fused vs three convs
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(16, 8, 56, 56, 128)), jnp.bfloat16)
    wc = jnp.asarray(rng.normal(size=(128, 160)) * 0.05, jnp.bfloat16)
    w3 = [jnp.asarray(rng.normal(size=(128, o)) * 0.05, jnp.bfloat16)
          for o in (16, 16, 128)]

    @jax.jit
    def fused(x):
        return jnp.einsum("bdhwc,co->bdhwo", x, wc,
                          preferred_element_type=jnp.float32).astype(x.dtype)

    @jax.jit
    def separate(x):
        outs = [jnp.einsum("bdhwc,co->bdhwo", x, w,
                           preferred_element_type=jnp.float32).astype(x.dtype)
                for w in w3]
        return jnp.concatenate(outs, -1)

    for name, f in (("fused proj", fused), ("separate proj", separate)):
        ms = chained(f, x)
        print(f"{name} x_1_3: {ms:.3f} ms")


if __name__ == "__main__":
    main()
