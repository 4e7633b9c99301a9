"""Single-chip benchmark of the ring-attention HOP BODY at flagship
long-clip shard shapes (VERDICT r3 item 3).

The ring itself needs a time mesh (multi-chip); the hop body — the per-
device compute between two ppermutes — runs on one chip, so its two
implementations can be A/B'd on the bench chip at the exact shard shapes:

  x_1_3 site, T=128 over 8 time shards:
    q [1, 25088, 16]   (D_loc=8 x 56 x 56 tokens, inter = 128//8)
    k [1, 3136, 16], v [1, 3136, 128]  (sub_size=2 pooled k/v shard)

  "xla"    — chunked einsum under jax.checkpoint (ops/ring_attention.py
             _ring_local's chunk_update, the pre-r4 only option)
  "pallas" — flash_attend_tokens_lse + hop-level online-softmax merge
             (_ring_pallas_local's hop)

Chained N-differencing methodology (bench.py docstring).
"""

import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp
import numpy as np

from sap3d_tpu.ops.ring_attention import RING_QUERY_CHUNK


def xla_hop(q, k, v, m, den, acc, chunk_q=RING_QUERY_CHUNK):
    """One hop of _ring_local (chunked online-softmax update)."""
    b, nq, _ = q.shape
    c = v.shape[-1]
    cq = min(chunk_q, nq)
    pad = (-nq) % cq
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0))) if pad else q
    nc = qp.shape[1] // cq
    qs = qp.reshape(b, nc, cq, -1).transpose(1, 0, 2, 3)
    ms = jnp.pad(m, ((0, 0), (0, pad)), constant_values=-jnp.inf) if pad else m
    dens = jnp.pad(den, ((0, 0), (0, pad))) if pad else den
    accs = jnp.pad(acc, ((0, 0), (0, pad), (0, 0))) if pad else acc
    ms = ms.reshape(b, nc, cq).transpose(1, 0, 2)
    dens = dens.reshape(b, nc, cq).transpose(1, 0, 2)
    accs = accs.reshape(b, nc, cq, c).transpose(1, 0, 2, 3)

    def chunk_update(args):
        qc, mc, lc, oc = args
        s = jnp.einsum("bqc,bkc->bqk", qc, k,
                       preferred_element_type=jnp.float32)
        m_new = jnp.maximum(mc, s.max(axis=-1))
        corr = jnp.exp(mc - m_new)
        p = jnp.exp(s - m_new[..., None])
        lc = lc * corr + p.sum(axis=-1)
        oc = oc * corr[..., None] + jnp.einsum(
            "bqk,bkc->bqc", p.astype(v.dtype), v,
            preferred_element_type=jnp.float32)
        return m_new, lc, oc

    ms, dens, accs = jax.lax.map(jax.checkpoint(chunk_update),
                                 (qs, ms, dens, accs))
    ms = ms.transpose(1, 0, 2).reshape(b, -1)[:, :nq]
    dens = dens.transpose(1, 0, 2).reshape(b, -1)[:, :nq]
    accs = accs.transpose(1, 0, 2, 3).reshape(b, -1, c)[:, :nq]
    return ms, dens, accs


def pallas_hop(q, k, v, m, den, acc):
    """One hop of _ring_pallas_local (flash kernel + hop-level merge)."""
    from sap3d_tpu.ops.pallas.flash_attention import flash_attend_tokens_lse

    o_h, lse8 = flash_attend_tokens_lse(q, k, v)
    lse_h = lse8[:, 0]
    new_m = jnp.maximum(m, lse_h)
    w_old = jnp.exp(m - new_m)
    w_new = jnp.exp(lse_h - new_m)
    acc = acc * w_old[..., None] + o_h.astype(jnp.float32) * w_new[..., None]
    den = den * w_old + w_new
    return new_m, den, acc


# scan-chained timing (one dispatch per run): Python-level chaining of
# these ~1 ms hops drowns in tunnel dispatch jitter — the r4 part-A run
# printed a NEGATIVE xla fwd time.  See scripts/_scan_timer.py.
from _scan_timer import scan_ms  # noqa: E402


def main():
    b, nq, nk, d, c = 1, 25088, 3136, 16, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, nq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, nk, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, nk, c)), jnp.bfloat16)
    m0 = jnp.full((b, nq), -jnp.inf, jnp.float32)
    den0 = jnp.zeros((b, nq), jnp.float32)
    acc0 = jnp.zeros((b, nq, c), jnp.float32)
    args = (q, k, v, m0, den0, acc0)

    for name, hop in (("xla", xla_hop), ("pallas", pallas_hop)):
        ms_f = scan_ms(hop, q, extra=args[1:])

        def loss(q, k, v, m, den, acc, hop=hop):
            nm, nden, nacc = hop(q, k, v, m, den, acc)
            out = nacc / nden[..., None]
            # quadratic: a linear loss makes parts of the backward input-
            # independent and loop-hoistable (see profile_decoder.py)
            return 0.5 * jnp.sum(out.astype(jnp.float32) ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))
        ms_fb = scan_ms(g, q, extra=args[1:])
        print(f"hop[{name:6s}]  fwd {ms_f:7.2f} ms   fwd+bwd {ms_fb:7.2f} ms",
              flush=True)

    # numeric cross-check at the bench shapes (one hop, fp32 reference)
    m1, d1, a1 = jax.jit(xla_hop)(*args)
    m2, d2, a2 = jax.jit(pallas_hop)(*args)
    o1 = a1 / d1[..., None]
    o2 = a2 / d2[..., None]
    err = float(jnp.max(jnp.abs(o1 - o2)))
    print(f"hop output max|xla-pallas| = {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
