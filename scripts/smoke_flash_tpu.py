"""Real-TPU smoke of the flash-attention kernel paths (post 2-D-lse change).

Checks, against the XLA reference on-device:
  1. lse-free primal (inference path)
  2. fwd with lse (training fwd rule) — lse values vs host log-sum-exp
  3. full fwd+bwd gradients through flash_attend_tokens

Shapes mirror the x_2_2 site (and a ragged-nq case for the padding path).
"""

import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp
import numpy as np

from sap3d_tpu.ops.pallas.flash_attention import (
    _flash_forward,
    flash_attend_tokens,
)


def ref(q, k, v):
    s = jnp.einsum("bqd,bkd->bqk", q, k).astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkc->bqc", p, v.astype(jnp.float32)).astype(v.dtype)


def check(name, got, want, tol):
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    status = "OK" if err <= tol else "FAIL"
    print(f"{name:28s} max|err| {err:.3e}  {status}", flush=True)
    return status == "OK"


def main():
    ok = True
    rng = np.random.default_rng(0)
    for nq, nk, d, c in ((3136, 784, 32, 256), (300, 49, 8, 16)):
        q = jnp.asarray(rng.normal(size=(2, nq, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(2, nk, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(2, nk, c)), jnp.float32)
        want = ref(q, k, v)

        got = jax.jit(flash_attend_tokens)(q, k, v)
        ok &= check(f"primal nolse {nq}x{nk}", got, want, 2e-2)

        o, lse = jax.jit(lambda a, b, cc: _flash_forward(a, b, cc))(q, k, v)
        ok &= check(f"fwd+lse out {nq}x{nk}", o, want, 2e-2)
        # oracle: ON-DEVICE XLA lse — a host float64 reference differs by
        # ~|s|*1e-3 because the chip's f32 matmul runs as bf16 MXU passes
        # (measured 0.066 at |lse|~33); kernel-vs-XLA isolates kernel bugs
        # from that shared hardware numeric (they agree to ~6e-6)
        want_lse = jax.jit(lambda a, b: jax.nn.logsumexp(
            jnp.einsum("bqd,bkd->bqk", a, b,
                       preferred_element_type=jnp.float32), axis=-1))(q, k)
        ok &= check(f"lse values {nq}x{nk}", lse[:, 0], want_lse, 1e-4)
        ok &= check(f"lse sublanes {nq}x{nk}", lse,
                    jnp.broadcast_to(lse[:, :1], lse.shape), 0.0)

        def loss_flash(q, k, v):
            return jnp.sum(flash_attend_tokens(q, k, v).astype(jnp.float32))

        def loss_ref(q, k, v):
            return jnp.sum(ref(q, k, v).astype(jnp.float32))

        gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
        gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
        for nm, a, b in zip("qkv", gf, gr):
            ok &= check(f"grad d{nm} {nq}x{nk}", a, b,
                        3e-2 * max(1.0, float(jnp.max(jnp.abs(b)))))
    print("SMOKE", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
