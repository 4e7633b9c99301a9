"""Ring attention over the time mesh vs the gather path.

Completes SURVEY.md section 5's long-context stretch: the SA sites run as a
shard_map ring (ppermute + online softmax) with q/k/v kept time-sharded,
and must match plain attend_tokens / the replicated model forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from sap3d_tpu.core.mesh import make_time_mesh, time_sharding
from sap3d_tpu.models.p3d import P3DSaliency
from sap3d_tpu.ops.attention import attend_tokens
from sap3d_tpu.ops.ring_attention import ring_attend_sharded
from sap3d_tpu.train.state import create_train_state

MICRO_STAGES = ((8, 1), (16, 1), (32, 1))


def test_ring_matches_gather_op_level():
    rng = np.random.default_rng(0)
    b, nq, nk, d, c = 2, 64, 32, 8, 16
    q = jnp.asarray(rng.normal(size=(b, nq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, nk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, nk, c)), jnp.float32)
    mesh = make_time_mesh(4)

    got = ring_attend_sharded(mesh, q, k, v)
    want = attend_tokens(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_ring_gradients_match_gather():
    """Training under the ring: jax differentiates through shard_map +
    ppermute; gradients must match the gather path."""
    rng = np.random.default_rng(1)
    b, nq, nk, d, c = 2, 64, 32, 8, 16
    q = jnp.asarray(rng.normal(size=(b, nq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, nk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, nk, c)), jnp.float32)
    mesh = make_time_mesh(4)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attend_sharded(mesh, q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attend_tokens(q, k, v) ** 2)

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for a, bb in zip(g_ring, g_ref):
        # online-softmax reorders the exp/sum reductions; tolerance covers
        # that fp noise (observed max dev ~2e-5 on O(1) grads)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=1e-4, atol=1e-4
        )


def test_ring_pallas_hop_matches_gather():
    """hop_impl="pallas" (flash kernel per hop + hop-level online-softmax
    merge) must match the gather path in values AND gradients — the grads
    exercise the backward kernel's lse-cotangent fold (+p*dlse), which only
    the ring merge consumes.  Interpret mode emulates the kernel on CPU;
    the real-silicon check is scripts/smoke_flash_tpu.py + the ring-hop
    benchmark (scripts/profile_ring_hop.py)."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(3)
    # nq_loc = 256 = BLOCK_Q (the kernel's minimum per-shard query count)
    b, nq, nk, d, c = 1, 1024, 512, 8, 16
    q = jnp.asarray(rng.normal(size=(b, nq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, nk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, nk, c)), jnp.float32)
    mesh = make_time_mesh(4)

    with pltpu.force_tpu_interpret_mode():
        got = ring_attend_sharded(mesh, q, k, v, hop_impl="pallas")
    want = attend_tokens(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )

    def loss_ring(q, k, v):
        return jnp.sum(
            ring_attend_sharded(mesh, q, k, v, hop_impl="pallas") ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attend_tokens(q, k, v) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, bb in zip(g_ring, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=1e-4, atol=1e-4
        )


def test_ring_time_sharded_train_step():
    """A full train step (fwd+bwd+Adam+BN) with ring SA under time sharding
    runs and matches the replicated non-ring step's loss.  Dropout off so
    the two programs compute the same function regardless of how the RNG
    bits partition."""
    from jax.sharding import NamedSharding

    from sap3d_tpu.train.steps import make_train_step

    mesh = make_time_mesh(4)
    T = 64
    shape = (2, T, 16, 16, 3)
    kw = dict(
        decoder="unetpp", decoder_kwargs=dict(attention="sa", head="ds"),
        norm_mode="bn", stages=MICRO_STAGES, stem_features=8,
        dropout_rate=0.0,
    )
    base = P3DSaliency(**kw)
    ring = P3DSaliency(**kw, ring_mesh=mesh)
    state = create_train_state(base, jax.random.PRNGKey(0), input_shape=shape)
    params = jax.tree_util.tree_map_with_path(
        lambda path, p: jnp.full_like(p, 0.7)
        if jax.tree_util.keystr(path).endswith("'gamma']") else p,
        state.params,
    )
    state = state.replace(params=params)
    rng = np.random.default_rng(2)
    frames = jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.3)
    targets = jnp.asarray(rng.random(shape[:-1]).astype(np.float32))
    key = jax.random.PRNGKey(9)

    step_ref = make_train_step(base, donate=False)
    _, loss_ref = step_ref(state, frames, targets, key)

    tsh = NamedSharding(mesh, jax.sharding.PartitionSpec(None, "time"))
    step_ring = make_train_step(ring, donate=False)
    f_sh = jax.device_put(frames, time_sharding(mesh))
    t_sh = jax.device_put(targets, tsh)
    _, loss_ring = step_ring(state, f_sh, t_sh, key)
    np.testing.assert_allclose(float(loss_ring), float(loss_ref), rtol=5e-4)


def test_ring_chunked_queries_match_gather():
    """Multiple query chunks per shard (chunk_q < nq_loc) — values AND
    gradients must still match the gather path."""
    rng = np.random.default_rng(3)
    b, nq, nk, d, c = 2, 256, 64, 8, 16
    q = jnp.asarray(rng.normal(size=(b, nq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, nk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, nk, c)), jnp.float32)
    mesh = make_time_mesh(4)  # nq_loc = 64, chunk_q 16 -> 4 chunks/shard

    got = ring_attend_sharded(mesh, q, k, v, chunk_q=16)
    want = attend_tokens(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )

    g_ring = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(ring_attend_sharded(mesh, q, k, v, chunk_q=16) ** 2),
        argnums=(0, 1, 2),
    ))(q, k, v)
    g_ref = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(attend_tokens(q, k, v) ** 2),
        argnums=(0, 1, 2),
    ))(q, k, v)
    for a, bb in zip(g_ring, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=1e-4, atol=1e-4
        )

    # non-divisible nq_loc / chunk_q (padding path)
    got_pad = ring_attend_sharded(mesh, q, k, v, chunk_q=24)
    np.testing.assert_allclose(
        np.asarray(got_pad), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_ring_feasible_at_flagship_x13_scale():
    """Long-clip feasibility at the scale that motivates ring attention
    (VERDICT r2 weak #2): the flagship x_1_3 site under T=128 over 8 time
    shards — nq_loc=25088 tokens PER SHARD (16 frames x 56x56), nk_loc=3136
    (8x subsampled), d=16, C=128.  Evidence is the compiled fwd+bwd
    program's memory analysis: with query chunking the per-device temp
    footprint must come in far below the unchunked formulation, whose
    backward holds [nq_loc, nk_loc] fp32 score blocks (~314MB each).
    Compile-only at this size (executing 3.4 TFLOP of attention on the CPU
    test runner is pointless); execution + gradient parity are covered at
    reduced size by test_ring_chunked_queries_match_gather.
    """
    mesh = make_time_mesh(8)
    b, d, c = 1, 16, 128
    nq_loc = 8 * 56 * 56   # 25088: the real x_1_3 token count per 16 frames
    nk_loc = nq_loc // 8   # 3136 after the sub_size=2 key/value pooling
    nq, nk = nq_loc * 8, nk_loc * 8
    q = jax.ShapeDtypeStruct((b, nq, d), jnp.float32)
    k = jax.ShapeDtypeStruct((b, nk, d), jnp.float32)
    v = jax.ShapeDtypeStruct((b, nk, c), jnp.float32)

    def mem_of(chunk_q):
        def loss(q, k, v):
            return jnp.sum(
                ring_attend_sharded(mesh, q, k, v, chunk_q=chunk_q) ** 2)

        step = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        return step.lower(q, k, v).compile().memory_analysis()

    chunked = mem_of(1024)
    unchunked = mem_of(nq_loc)
    full_block = nq_loc * nk_loc * 4  # one fp32 score block per device
    # temp_size_in_bytes sums buffers across all 8 virtual devices
    per_dev_chunked = chunked.temp_size_in_bytes / 8
    per_dev_unchunked = unchunked.temp_size_in_bytes / 8
    # the unchunked program really does pay the full-block price per device
    # (measured ~2.3GB fwd-only total = 8 x the 314MB block)...
    assert per_dev_unchunked > full_block, (per_dev_unchunked, full_block)
    # ...and chunking removes it: the per-device live set is one
    # [1024, nk_loc] score chunk + online-softmax carries + remat slack
    # (measured ~40MB vs the 314MB block)
    assert per_dev_chunked < full_block // 4, (per_dev_chunked, full_block)
    assert chunked.temp_size_in_bytes < unchunked.temp_size_in_bytes // 4


def test_ring_matches_gather_in_model_forward():
    """Time-sharded long-clip forward with ring SA == replicated forward."""
    mesh = make_time_mesh(4)
    T = 64  # 4x the reference clip length; every SA site's D divides by 4
    shape = (1, T, 16, 16, 3)

    base = P3DSaliency(
        decoder="unetpp", decoder_kwargs=dict(attention="sa", head="ds"),
        norm_mode="bn", stages=MICRO_STAGES, stem_features=8,
    )
    ring = P3DSaliency(
        decoder="unetpp", decoder_kwargs=dict(attention="sa", head="ds"),
        norm_mode="bn", stages=MICRO_STAGES, stem_features=8,
        ring_mesh=mesh,
    )
    state = create_train_state(base, jax.random.PRNGKey(0), input_shape=shape)
    # the SA gamma gates init to 0 (identity) — open them so the comparison
    # is actually sensitive to the attention values
    params = jax.tree_util.tree_map_with_path(
        lambda path, p: jnp.full_like(p, 0.7)
        if jax.tree_util.keystr(path).endswith("'gamma']") else p,
        state.params,
    )
    n_gamma = sum(
        1 for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]
        if jax.tree_util.keystr(path).endswith("'gamma']")
    )
    assert n_gamma >= 4, n_gamma
    state = state.replace(params=params)
    frames = jnp.asarray(
        np.random.default_rng(0).normal(size=shape).astype(np.float32) * 0.3
    )
    tsh = time_sharding(mesh)
    repl = NamedSharding(mesh, P())

    def fwd(model, s, f):
        return model.apply(
            {"params": s.params, "batch_stats": s.batch_stats}, f, train=False
        )

    out_ring = jax.jit(
        lambda s, f: fwd(ring, s, f), in_shardings=(repl, tsh)
    )(state, jax.device_put(frames, tsh))
    out_ref = jax.jit(lambda s, f: fwd(base, s, f))(state, frames)
    assert out_ring.shape == (1, T, 16, 16, 1)
    np.testing.assert_allclose(
        np.asarray(out_ring), np.asarray(out_ref), atol=2e-5
    )
    # the ring output stays time-sharded (no all-gather snuck in)
    assert not out_ring.sharding.is_fully_replicated
