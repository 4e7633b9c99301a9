"""Ring attention over a time-sharded mesh (long-clip sequence parallelism).

The reference fixes clips at 16 frames; long-clip mode shards the time axis
over a mesh (core/mesh.py:make_time_mesh).  Under plain GSPMD the global
self-attention sites (ops/attention.py) force an all-gather of keys/values
on every device; this module instead keeps q/k/v sharded and rotates the
k/v shards around the ring with `lax.ppermute`, combining per-hop partial
attention with the online-softmax (running max / running sum) recurrence —
the standard blockwise/ring-attention formulation.  Queries are processed
in chunks under ``jax.checkpoint`` inside every hop, so peak memory per
device is ONE [chunk_q, nk_local] score block (never the full
[nq_local, nk_local] — at the flagship x_1_3 site that block would be
~314MB fp32 per hop) and the backward rematerializes scores chunk by
chunk; communication rides neighbor links only.

Semantics: unscaled dot-product softmax attention, exactly
`attend_tokens` (reference utils/network.py:184-186), up to float
reordering — asserted against the gather path in
tests/test_ring_attention.py.

Token order contract: tokens must be time-major (the natural
[B, D, H, W, C] -> [B, D*H*W, C] flatten), so a contiguous token chunk is a
contiguous time chunk and the shard_map specs below line up with the
GSPMD activation sharding — no resharding at the boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sap3d_tpu.core.mesh import TIME_AXIS


# Rows of queries updated per inner step: bounds the live score block to
# [RING_QUERY_CHUNK, nk_local] per device (~12MB fp32 at the flagship x_1_3
# site's nk_loc=3136) regardless of nq_local.
RING_QUERY_CHUNK = 1024


def _ring_pallas_local(q: jax.Array, k: jax.Array, v: jax.Array, axis: str,
                       n: int) -> jax.Array:
    """Per-shard ring attention with the Pallas flash kernel as hop body.

    Each hop runs `flash_attend_tokens_lse` on the resident k/v shard (one
    fused MXU pass, scores never leave VMEM) and merges the hop's
    NORMALIZED partial output into the running (m, den, acc) online-softmax
    state at HOP granularity — given per-hop (o_h, lse_h):
        new_m = max(m, lse_h);  w = exp(lse_h - new_m)
        acc = acc*exp(m - new_m) + o_h * w;   den = den*exp(m - new_m) + w
    which telescopes to softmax over the full key axis (same recurrence as
    the XLA chunk body, applied per hop instead of per chunk).
    `jax.checkpoint` per hop drops the kernel's (o_h, lse_h) residuals —
    the backward re-runs the hop forward, then the fused backward kernel
    (whose softmax vjp folds the lse cotangent from the merge arithmetic).
    """
    from sap3d_tpu.ops.pallas.flash_attention import flash_attend_tokens_lse

    b, nq, _ = q.shape
    c = v.shape[-1]
    perm = [(j, (j + 1) % n) for j in range(n)]
    m = jnp.full((b, nq), -jnp.inf, jnp.float32)
    den = jnp.zeros((b, nq), jnp.float32)
    acc = jnp.zeros((b, nq, c), jnp.float32)

    def hop(q, k, v, m, den, acc):
        o_h, lse8 = flash_attend_tokens_lse(q, k, v)
        lse_h = lse8[:, 0]  # [B, nq]
        new_m = jnp.maximum(m, lse_h)
        w_old = jnp.exp(m - new_m)
        w_new = jnp.exp(lse_h - new_m)
        acc = acc * w_old[..., None] + o_h.astype(jnp.float32) * w_new[..., None]
        den = den * w_old + w_new
        return new_m, den, acc

    # CPU interpret mode emulates the kernel via an ordered io_callback,
    # whose effect jax.checkpoint cannot partial-eval; compiled kernels on
    # real TPUs are effect-free, so remat applies there (where it matters).
    try:
        from jax._src import config as _jcfg

        interpreted = (
            _jcfg.pallas_tpu_interpret_mode_context_manager.value is not None
        )
    except Exception:  # private flag moved — assume compiled (remat on)
        interpreted = False
    hop_fn = hop if interpreted else jax.checkpoint(hop)

    for _hop in range(n):
        m, den, acc = hop_fn(q, k, v, m, den, acc)
        if _hop != n - 1:
            k = jax.lax.ppermute(k, axis, perm)
            v = jax.lax.ppermute(v, axis, perm)
    return (acc / den[..., None]).astype(v.dtype)


def _ring_local(q: jax.Array, k: jax.Array, v: jax.Array, axis: str,
                n: int, chunk_q: int = RING_QUERY_CHUNK) -> jax.Array:
    """Per-shard ring attention body (call under shard_map).

    q [B, nq_loc, d], k [B, nk_loc, d], v [B, nk_loc, C] -> [B, nq_loc, C].
    ``n`` is the static ring size (mesh axis length).

    Every hop updates the online-softmax state (running max m, running sum
    l, running output o) for all query chunks via ``lax.map`` over chunks —
    chunks are independent, so serializing them bounds peak memory to one
    [chunk_q, nk_loc] score block; ``jax.checkpoint`` makes the backward
    recompute scores per chunk instead of saving them (the flash-attention
    remat policy, matching ops/attention.py:attend_tokens).
    """
    b, nq, d = q.shape
    c = v.shape[-1]
    perm = [(j, (j + 1) % n) for j in range(n)]

    cq = min(chunk_q, nq)
    pad = (-nq) % cq
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    nqp = q.shape[1]
    nc = nqp // cq
    # chunk-major for lax.map: [nc, B, cq, ...]
    qs = q.reshape(b, nc, cq, d).transpose(1, 0, 2, 3)
    m = jnp.full((nc, b, cq), -jnp.inf, jnp.float32)  # running row max
    l = jnp.zeros((nc, b, cq), jnp.float32)  # running sum of exp
    o = jnp.zeros((nc, b, cq, c), jnp.float32)  # running weighted values

    for _hop in range(n):

        def chunk_update(args, k=k, v=v):
            qc, mc, lc, oc = args  # [B,cq,d], [B,cq], [B,cq], [B,cq,C]
            s = jnp.einsum(
                "bqc,bkc->bqk", qc, k, preferred_element_type=jnp.float32
            )
            m_new = jnp.maximum(mc, s.max(axis=-1))
            corr = jnp.exp(mc - m_new)
            p = jnp.exp(s - m_new[..., None])
            lc = lc * corr + p.sum(axis=-1)
            oc = oc * corr[..., None] + jnp.einsum(
                "bqk,bkc->bqc", p.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            )
            return m_new, lc, oc

        m, l, o = jax.lax.map(jax.checkpoint(chunk_update), (qs, m, l, o))
        if _hop != n - 1:
            k = jax.lax.ppermute(k, axis, perm)
            v = jax.lax.ppermute(v, axis, perm)
    out = (o / l[..., None]).astype(v.dtype)  # [nc, B, cq, C]
    return out.transpose(1, 0, 2, 3).reshape(b, nqp, c)[:, :nq]


def ring_attend_sharded(
    mesh: Mesh, q: jax.Array, k: jax.Array, v: jax.Array,
    axis: str = TIME_AXIS, chunk_q: int = RING_QUERY_CHUNK,
    hop_impl: str | None = None,
) -> jax.Array:
    """Ring attention with q/k/v sharded on the token axis over ``axis``.

    Drop-in for attend_tokens/flash_attend_tokens when the activations are
    time-sharded: tokens stay distributed, k/v shards circulate the ring.

    ``hop_impl`` selects the per-hop body: "pallas" (the fused flash kernel
    per hop + hop-level online-softmax merge — the fast path on real TPUs,
    +52% at the SA sites single-chip, BASELINE.md), "xla" (chunked einsum
    under remat), or None = auto: pallas on TPU when the SHARD shapes pass
    the kernel's VMEM viability gate, else xla.  Override with
    SAP3D_RING_HOP=pallas|xla.
    """
    import os

    n = mesh.shape[axis]
    spec = P(None, axis, None)
    if n == 1:
        from sap3d_tpu.ops.attention import attend_tokens

        return attend_tokens(q, k, v)
    hop_impl = hop_impl or os.environ.get("SAP3D_RING_HOP")
    if hop_impl is None:
        from sap3d_tpu.ops.pallas.flash_attention import (
            flash_attention_viable,
            on_tpu,
        )

        nq_loc = q.shape[1] // n
        nk_loc = k.shape[1] // n
        hop_impl = "pallas" if (
            on_tpu()
            and flash_attention_viable(
                nq_loc, nk_loc, q.shape[2], v.shape[2],
                itemsize=q.dtype.itemsize,
            )
        ) else "xla"
    if hop_impl == "pallas":
        local = lambda q_, k_, v_: _ring_pallas_local(q_, k_, v_, axis, n)  # noqa: E731
    elif hop_impl == "xla":
        local = lambda q_, k_, v_: _ring_local(q_, k_, v_, axis, n, chunk_q)  # noqa: E731
    else:
        raise ValueError(f"unknown ring hop_impl: {hop_impl!r}")
    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        # pallas_call outputs carry no varying-mesh-axes annotation, which
        # the vma checker requires; the specs above pin the sharding anyway
        check_vma=(hop_impl != "pallas"),
    )
    return fn(q, k, v)
