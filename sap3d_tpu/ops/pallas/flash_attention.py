"""Pallas TPU kernel: fused softmax(q k^T) v for the self-attention op.

Why a kernel: the SAGAN attention sites (ops/attention.py) have large query
counts but moderate key counts after subsampling (Nk <= ~3.1k for 112x112
clips).  The XLA path materializes the [Nq, Nk] score matrix in HBM between
the two matmuls (39MB for the x_2_2 site, 2.5GB for the full-head x_0_1
site); this kernel tiles queries into VMEM-resident blocks so scores never
leave VMEM — the op becomes two back-to-back MXU matmuls per block with the
softmax fused between them, eliminating the HBM round trip.

Shape contract: q [B, Nq, d], k [B, Nk, d], v [B, Nk, C] -> [B, Nq, C].
Whole k/v live in VMEM per batch program (checked against a VMEM budget by
the caller/`flash_attention_viable`); queries are processed in BLOCK_Q rows
per grid step.  Softmax is unscaled dot-product over the key axis, exactly
matching ops/attention.py:_dot_softmax_attend (reference semantics
utils/network.py:184-186).

Backward: custom_vjp whose backward recomputes the attention with the
XLA chunked path and differentiates through it (flash-style recompute — no
residual score matrix is ever stored).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 256
# Sublane replication factor of the saved lse rows (one full sublane tile),
# required for a Mosaic-legal [1, 8, BLOCK_Q] output block — see _fwd_kernel.
LSE_SUBLANES = 8
# Conservative working-set budgets tuned for the flagship's SA sites
# (d=16, c<=128).  The GN family's decoder sites (nq=nk=6272, d up to 128,
# c up to 1024 — models/p3d.py GNDecoderBlock) need ~20-43MB fwd / ~24-59MB
# bwd, still well under the v5e's 128MB physical VMEM; SAP3D_FLASH_VMEM_MB
# raises the gate (bwd budget = 1.2x the env value) so those sites take the
# kernel instead of the chunked-XLA fallback.  Measured A/B decides the
# default (BASELINE.md round 5).
VMEM_BUDGET_BYTES = 10 * 1024 * 1024
# The backward's footprint is modeled more tightly (no blanket 2x factor:
# k/v/dk/dv are grid-resident and the [BQ, Nk] intermediates are scratch),
# so its budget sits closer to the physical 16MB.
VMEM_BUDGET_BWD_BYTES = 12 * 1024 * 1024


# Inference-only forward budget: wide enough to admit the GN decoder's SA
# sites (largest fwd working set ~43MB at dp4).  Measured on v5e 2026-08-20
# (BASELINE.md round 5 part C): at those sites the flash FORWARD wins
# +10.5% whole-model inference (224.1 vs 202.8 clips/s, b16) while the
# flash BACKWARD loses badly (323.6 vs 242.5 ms/step train — the fp32
# dk/dv accumulators + [BQ,Nk] intermediates at c=1024 blow the VMEM
# working set), so the gate is asymmetric: training keeps the
# flagship-tuned 10/12MB budgets, inference admits up to 56MB.
VMEM_BUDGET_INFER_BYTES = 56 * 1024 * 1024


def _budgets() -> tuple[int, int]:
    import os

    mb = os.environ.get("SAP3D_FLASH_VMEM_MB")
    if mb:
        b = int(float(mb) * 1024 * 1024)
        return b, int(b * 1.2)
    return VMEM_BUDGET_BYTES, VMEM_BUDGET_BWD_BYTES


def _vmem_ceiling_bytes() -> int:
    """Mosaic scoped-vmem ceiling for the kernels (SAP3D_FLASH_CEILING_MB).

    Default 100MB (raised from the r4 64MB when the inference gate started
    admitting the GN decoder sites, whose dp4 forward working set is ~43MB
    before pipeline buffering; v5e physical VMEM is 128MB).  This is a cap,
    not an allocation — kernels that fit 64MB are unaffected."""
    import os

    return int(float(os.environ.get("SAP3D_FLASH_CEILING_MB", "100"))
               * 1024 * 1024)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref):
    # q_ref [1, BQ, d], k_ref [1, Nk, d], v_ref [1, Nk, C], o_ref [1, BQ, C],
    # lse_ref [1, BQ] — the log-sum-exp per query row, saved for the
    # backward's one-exp softmax reconstruction.  ``lse_ref`` is None on the
    # inference path (custom_vjp primal), which skips the log and the extra
    # output stream entirely.
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, Nk]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    p = e / l
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)
    if lse_ref is not None:
        # lse is stored [b, LSE_SUBLANES, nq] (block [1, 8, BQ]): a trailing
        # size-1 dim would be lane-padded to 128 by the TPU tiled layout
        # (~200MB/step extra residual traffic at the x_1_3 site), and a bare
        # 2-D [b, nq] block (1, BQ) violates the Mosaic tiling rule (the
        # sublane block dim must be divisible by 8 or equal the array dim —
        # it mis-tiled on real hardware, r3 queue log).  Replicating the row
        # across the 8 sublanes of one tile keeps the layout legal at 8x the
        # bare-row bytes (16x less than lane padding); the [BQ, 1] -> [1, BQ]
        # relayout is a single in-VMEM transpose.
        row = jnp.transpose(m + jnp.log(l))  # [1, BQ]
        lse_ref[0] = jnp.broadcast_to(row, (LSE_SUBLANES, row.shape[1]))


def _flash_forward(q: jax.Array, k: jax.Array, v: jax.Array,
                   want_lse: bool = True):
    b, nq, d = q.shape
    _, nk, c = v.shape
    pad = (-nq) % BLOCK_Q
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    nq_p = q.shape[1]
    grid = (b, nq_p // BLOCK_Q)

    out_shape = [jax.ShapeDtypeStruct((b, nq_p, c), v.dtype)]
    out_specs = [pl.BlockSpec((1, BLOCK_Q, c), lambda bi, qi: (bi, qi, 0),
                              memory_space=pltpu.VMEM)]
    if want_lse:
        out_shape.append(
            jax.ShapeDtypeStruct((b, LSE_SUBLANES, nq_p), jnp.float32))
        out_specs.append(pl.BlockSpec((1, LSE_SUBLANES, BLOCK_Q),
                                      lambda bi, qi: (bi, 0, qi),
                                      memory_space=pltpu.VMEM))
        kernel = _fwd_kernel
    else:
        kernel = lambda qr, kr, vr, orf: _fwd_kernel(qr, kr, vr, orf, None)  # noqa: E731

    res = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape) if want_lse else out_shape[0],
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, d), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, c), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs) if want_lse else out_specs[0],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nq_p * nk * (d + c),
            bytes_accessed=(q.size + k.size + v.size + b * nq_p * c) * 4,
            transcendentals=b * nq_p * nk,
        ),
        # see the backward's note: Mosaic's scoped-vmem need is batch-
        # dependent beyond the block-shape model; lift the 16MB default
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_ceiling_bytes(),
        ),
    )(q, k, v)
    if not want_lse:
        return res[:, :nq], None
    out, lse = res
    return out[:, :nq], lse[:, :, :nq]  # lse [b, LSE_SUBLANES, nq]


# Backward uses smaller query blocks: three [BQ, Nk] fp32 intermediates plus
# fp32 dk/dv accumulators must fit VMEM together.
BLOCK_Q_BWD = 256


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, dlse_ref,
                dq_ref, dk_ref, dv_ref):
    """Backward for one query block; dk/dv accumulate across the sequential
    qi grid axis (their output block is qi-invariant, so Pallas keeps it
    resident in VMEM for the whole b-row of the grid).

    Uses the forward's saved (o, lse):
      * p = exp(s - lse) — one transcendental pass instead of the full
        softmax re-reduction (max/sub/sum/div);
      * the softmax-vjp row term sum(dp*p) equals sum(do*o) (standard
        flash-attention identity), a [BQ, C] reduction instead of [BQ, Nk].
    All five matmuls feed the MXU bf16 operands (fp32 MXU passes are ~8x
    slower); accumulation and the vjp arithmetic stay fp32, and the dk/dv
    cross-block accumulators are fp32 VMEM.  bf16 rounding of p/ds before
    their matmuls is the standard flash-attention backward precision
    (parity-tested vs the XLA fp32-chunked path in
    tests/test_pallas_attention.py).
    """
    qi = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    o = o_ref[0]
    # lse block [LSE_SUBLANES, BQ]: every sublane holds the same row (see
    # _fwd_kernel); transpose one row back to the [BQ, 1] broadcast shape.
    lse = jnp.transpose(lse_ref[0][:1, :])  # [BQ, 1]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    p = jnp.exp(s - lse)  # lse [BQ, 1] -> [BQ, Nk] f32
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, Nk] f32
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )  # [BQ, 1] == sum(dp * p, -1)
    if dlse_ref is not None:
        # lse cotangent (ring-hop merge consumes lse): d lse / d s = p, so
        # it folds into the softmax vjp's row term.  The primal broadcast
        # lse across LSE_SUBLANES rows, so the cotangent is their SUM.
        dlse = jnp.transpose(
            jnp.sum(dlse_ref[0], axis=0, keepdims=True))  # [BQ, 1]
        delta = delta - dlse
    ds = p * (dp - delta)  # softmax vjp
    ds_lo = ds.astype(k.dtype)
    p_lo = p.astype(v.dtype)

    dq_ref[0] = jnp.dot(
        ds_lo, k, preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)

    @pl.when(qi == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += jax.lax.dot_general(
        ds_lo, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dv_ref[0] += jax.lax.dot_general(
        p_lo, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _flash_backward(q, k, v, do, o, lse, dlse=None):
    b, nq, d = q.shape
    _, nk, c = v.shape
    pad = (-nq) % BLOCK_Q_BWD
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        do = jnp.pad(do, ((0, 0), (0, pad), (0, 0)))
        o = jnp.pad(o, ((0, 0), (0, pad), (0, 0)))
        # padded rows: exp(0 - 0) = 1 would poison dk/dv sums; push lse to
        # +inf so p = exp(-inf) = 0 there
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, pad)),
                      constant_values=jnp.inf)
        if dlse is not None:
            dlse = jnp.pad(dlse, ((0, 0), (0, 0), (0, pad)))
    nq_p = q.shape[1]
    grid = (b, nq_p // BLOCK_Q_BWD)

    lse_spec = pl.BlockSpec((1, LSE_SUBLANES, BLOCK_Q_BWD),
                            lambda bi, qi: (bi, 0, qi),
                            memory_space=pltpu.VMEM)
    if dlse is None:
        kernel = lambda qr, kr, vr, dor, orf, lr, *outs: _bwd_kernel(  # noqa: E731
            qr, kr, vr, dor, orf, lr, None, *outs)
        extra_in, extra_specs = (), ()
    else:
        kernel = _bwd_kernel
        extra_in, extra_specs = (dlse,), (lse_spec,)

    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, nq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b, nk, d), jnp.float32),
            jax.ShapeDtypeStruct((b, nk, c), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q_BWD, d), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, c), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q_BWD, c), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q_BWD, c), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            lse_spec,
            *extra_specs,
        ],
        out_specs=(
            pl.BlockSpec((1, BLOCK_Q_BWD, d), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, c), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * nq_p * nk * (d + c) // 2,
            bytes_accessed=(2 * q.size + k.size + 2 * v.size) * 4,
            transcendentals=b * nq_p * nk,
        ),
        # Mosaic's default scoped-vmem ceiling is 16MB; its ACTUAL stack
        # need for this kernel is batch-dependent in a way the block-shape
        # model can't see (measured r4: the x_2_2 site fits at b<=24 but
        # asks 19.21M at b=32 and fails the whole train-step compile).
        # Raise the ceiling for this kernel only — v5e VMEM is 128MB and
        # our gate already bounds the resident working set to ~12MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_ceiling_bytes(),
        ),
    )(q, k, v, do, o, lse, *extra_in)
    return dq[:, :nq], dk.astype(k.dtype), dv.astype(v.dtype)


@jax.custom_vjp
def flash_attend_tokens(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Fused attention: Pallas forward + Pallas one-exp backward (saved lse).

    The primal body (what inference runs — custom_vjp only calls the fwd
    rule under differentiation) skips the lse computation and its output
    stream; training pays for lse only because its backward consumes it.
    """
    return _flash_forward(q, k, v, want_lse=False)[0]


def _fwd_rule(q, k, v):
    o, lse = _flash_forward(q, k, v)
    return o, (q, k, v, o, lse)


def _bwd_rule(res, g):
    q, k, v, o, lse = res
    return _flash_backward(q, k, v, g.astype(v.dtype), o, lse)


flash_attend_tokens.defvjp(_fwd_rule, _bwd_rule)


@jax.custom_vjp
def flash_attend_tokens_lse(q: jax.Array, k: jax.Array, v: jax.Array):
    """Fused attention returning (o, lse) — the ring-hop body
    (ops/ring_attention.py merges per-hop partials with lse weights).

    lse is the sublane-replicated [B, LSE_SUBLANES, Nq] layout (every
    sublane row holds the same value — slice ``[:, 0]``); its cotangent is
    folded into the softmax vjp in the backward kernel (ds gains +p*dlse).
    """
    return _flash_forward(q, k, v, want_lse=True)


def _fwd_rule_lse(q, k, v):
    o, lse = _flash_forward(q, k, v)
    return (o, lse), (q, k, v, o, lse)


def _bwd_rule_lse(res, g):
    q, k, v, o, lse = res
    do, dlse = g
    return _flash_backward(q, k, v, do.astype(v.dtype), o, lse,
                           dlse=dlse.astype(jnp.float32))


flash_attend_tokens_lse.defvjp(_fwd_rule_lse, _bwd_rule_lse)


@jax.custom_vjp
def flash_fwd_chunked_bwd(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Hybrid for shapes where the flash FORWARD wins but the flash
    BACKWARD loses (the GN decoder's SA sites, BASELINE.md round 5 part C:
    c=1024 keeps ~43MB of fp32 dk/dv accumulators + [BQ,Nk] intermediates
    VMEM-resident and the backward kernel measured -19% at full step).

    Forward: the Pallas kernel, no lse output (scores never touch HBM).
    Backward: flash-style recompute through the chunked XLA path
    (ops/attention.py:attend_tokens) and autodiff of it — the same math,
    so gradients agree with either pure path at fp rounding level."""
    return _flash_forward(q, k, v, want_lse=False)[0]


def _hybrid_fwd_rule(q, k, v):
    return _flash_forward(q, k, v, want_lse=False)[0], (q, k, v)


def _hybrid_bwd_rule(res, g):
    from sap3d_tpu.ops.attention import attend_tokens

    q, k, v = res
    _, vjp = jax.vjp(attend_tokens, q, k, v)
    return vjp(g)


flash_fwd_chunked_bwd.defvjp(_hybrid_fwd_rule, _hybrid_bwd_rule)


def flash_attention_viable(
    nq: int, nk: int, d: int, c: int, itemsize: int = 4,
    training: bool = True,
) -> bool:
    """Whole-k/v-in-VMEM check for the kernel's blocking scheme.

    Models BOTH the forward and the backward footprints (the backward holds
    three [BLOCK_Q_BWD, Nk] fp32 intermediates plus fp32 dk/dv accumulators
    resident in VMEM, so shapes can pass the forward gate yet only blow VMEM
    in the backward).  Pass ``training=False`` for inference-only callers
    (eval/predict): only the forward budget applies there, so borderline
    sites within ~1% of the backward budget still take the fast kernel."""
    fwd = (
        nk * d * itemsize  # k
        + nk * c * itemsize  # v
        + BLOCK_Q * nk * 4  # scores in fp32
        + BLOCK_Q * (d + c) * itemsize  # q block + o block
    )
    bwd = (
        nk * (d + c) * itemsize  # k + v inputs (grid-resident)
        + nk * (d + c) * 4  # fp32 dk/dv accumulators, qi-invariant resident
        # [BQ, Nk] fp32 intermediates (s/p, dp, ds): at most two live at
        # once (s->p in place; dp consumed into ds; p kept for dv).
        + 2 * BLOCK_Q_BWD * nk * 4
        # streamed per-q-block buffers (q, do, o in + the [BQ] lse row;
        # dq out), double-buffered by the pipeline.
        + 2 * (BLOCK_Q_BWD * (d + 2 * c + 1) * itemsize
               + BLOCK_Q_BWD * d * 4)
    )
    budget_fwd, budget_bwd = _budgets()
    if not training:
        # inference-only: no backward constraint, and the wider forward
        # budget admits the GN decoder sites (see VMEM_BUDGET_INFER_BYTES)
        budget_fwd = max(budget_fwd, VMEM_BUDGET_INFER_BYTES)
    return (
        fwd * 2 <= budget_fwd
        and (not training or bwd <= budget_bwd)
        and nq >= BLOCK_Q
    )


@functools.cache
def on_tpu() -> bool:
    # Check the device platform, not the backend name: TPU-via-plugin
    # backends (e.g. this environment's tunneled "axon" backend) report a
    # custom backend name but their devices are platform "tpu".
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False
