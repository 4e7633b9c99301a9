"""Ring attention over a time-sharded mesh (long-clip sequence parallelism).

The reference fixes clips at 16 frames; long-clip mode shards the time axis
over a mesh (core/mesh.py:make_time_mesh).  Under plain GSPMD the global
self-attention sites (ops/attention.py) force an all-gather of keys/values
on every device; this module instead keeps q/k/v sharded and rotates the
k/v shards around the ring with `lax.ppermute`, combining per-hop partial
attention with the online-softmax (running max / running sum) recurrence —
the standard blockwise/ring-attention formulation.  Peak memory per device
is one [nq_local, nk_local] score block and communication rides neighbor
links only.

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


def _ring_local(q: jax.Array, k: jax.Array, v: jax.Array, axis: str,
                n: int) -> jax.Array:
    """Per-shard ring attention body (call under shard_map).

    q [B, nq_loc, d], k [B, nk_loc, d], v [B, nk_loc, C] -> [B, nq_loc, C].
    ``n`` is the static ring size (mesh axis length).
    """
    b, nq, _ = q.shape
    c = v.shape[-1]
    perm = [(j, (j + 1) % n) for j in range(n)]

    m = jnp.full((b, nq), -jnp.inf, jnp.float32)  # running row max
    l = jnp.zeros((b, nq), jnp.float32)  # running sum of exp
    o = jnp.zeros((b, nq, c), jnp.float32)  # running weighted values

    for _hop in range(n):
        s = jnp.einsum(
            "bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32
        )
        m_new = jnp.maximum(m, s.max(axis=-1))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l = l * corr + p.sum(axis=-1)
        o = o * corr[..., None] + jnp.einsum(
            "bqk,bkc->bqc", p.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
        m = m_new
        if _hop != n - 1:
            k = jax.lax.ppermute(k, axis, perm)
            v = jax.lax.ppermute(v, axis, perm)
    return (o / l[..., None]).astype(v.dtype)


def ring_attend_sharded(
    mesh: Mesh, q: jax.Array, k: jax.Array, v: jax.Array,
    axis: str = TIME_AXIS,
) -> jax.Array:
    """Ring attention with q/k/v sharded on the token axis over ``axis``.

    Drop-in for attend_tokens/flash_attend_tokens when the activations are
    time-sharded: tokens stay distributed, k/v shards circulate the ring.
    """
    n = mesh.shape[axis]
    spec = P(None, axis, None)
    if n == 1:
        from sap3d_tpu.ops.attention import attend_tokens

        return attend_tokens(q, k, v)
    fn = jax.shard_map(
        lambda q_, k_, v_: _ring_local(q_, k_, v_, axis, n),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )
    return fn(q, k, v)
