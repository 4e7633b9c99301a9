"""Self-attention and non-local blocks over 3D (D,H,W) token grids.

TPU-native re-implementation of the reference's SAGAN-style ``attention`` op
(reference utils/network.py:157-196) and ``non_local`` block (reference
utils/network.py:114-154).

Semantics notes (see SURVEY.md section 2.2 for the full accounting):

* The reference's live attention configurations are ``subsample=False`` and
  ``subsample=True, sub_size=2``.  In the latter, keys/values (f, h) are
  max-pooled by 2 while queries (g) are pooled by ``sub_size/2 == 1`` — i.e.
  not pooled at all — and the trailing 1x1x1 conv has stride ``sub_size/2==1``.
  We therefore implement the general, self-consistent rule: *keys/values are
  pooled by sub_size, queries are never pooled, output conv stride is 1*.
  This is bit-for-bit the reference behavior for both live configurations and
  the natural extension for larger sub_size (the reference's own
  ``sub_size=4`` path produces a shape mismatch and cannot run there either).

* Softmax is over the key axis (reference utils/network.py:185), scores are
  unscaled dot products, and the output is gated by a scalar ``gamma``
  initialized to 0 so the block starts as the identity.

* The non-local block divides scores by the key-token count instead of a
  softmax (dot-product instantiation of Wang et al.), then applies a 1x1x1
  conv + BN + ReLU and a residual add.  The reference's ``sub_sample=True``
  path crashes (pool3d missing its size argument, reference
  utils/network.py:125); here it pools keys/values by 2, the standard
  non-local subsampling.

For large query counts the score matrix is never materialized: queries are
processed in chunks under ``jax.checkpoint`` so XLA keeps peak memory at one
chunk of scores and rematerializes in the backward pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sap3d_tpu.ops.layers import Norm, glorot, pool3d

# Above this many query tokens, use the chunked (flash-style) path.
_CHUNKED_THRESHOLD = 4096
_QUERY_CHUNK = 4096


def _dot_softmax_attend(
    q: jax.Array, k: jax.Array, v: jax.Array, precision=None
) -> jax.Array:
    """softmax(q @ k^T) @ v for one batch of tokens; fp32 accumulation.

    q: [B, Nq, ci], k: [B, Nk, ci], v: [B, Nk, C] -> [B, Nq, C]

    ``precision`` follows jax.lax.Precision; the backend default (bf16-input
    passes on the MXU with fp32 accumulation) is right for model compute —
    pass HIGHEST only when verifying numerics.
    """
    acc = jnp.promote_types(q.dtype, jnp.float32)  # f32, or f64 under x64
    scores = jnp.einsum(
        "bqc,bkc->bqk", q, k, preferred_element_type=acc,
        precision=precision,
    )
    beta = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bqk,bkc->bqc", beta.astype(v.dtype), v,
        preferred_element_type=acc, precision=precision,
    )
    return out.astype(v.dtype)


def attend_tokens(
    q: jax.Array, k: jax.Array, v: jax.Array, precision=None
) -> jax.Array:
    """Unscaled dot-product attention, chunking queries when Nq is large.

    The chunked path never materializes the full [Nq, Nk] score matrix:
    each chunk is computed under jax.checkpoint, bounding live memory to
    [chunk, Nk] and rematerializing scores in the backward pass.
    """
    b, nq, _ = q.shape
    if nq <= _CHUNKED_THRESHOLD:
        return _dot_softmax_attend(q, k, v, precision)

    chunk = _QUERY_CHUNK
    pad = (-nq) % chunk
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    n_chunks = q.shape[1] // chunk
    qs = q.reshape(b, n_chunks, chunk, q.shape[-1]).transpose(1, 0, 2, 3)

    attend = jax.checkpoint(lambda qc: _dot_softmax_attend(qc, k, v, precision))
    out = jax.lax.map(attend, qs)  # [n_chunks, B, chunk, C]
    out = out.transpose(1, 0, 2, 3).reshape(b, n_chunks * chunk, v.shape[-1])
    return out[:, :nq]


def _flatten_tokens(x: jax.Array) -> jax.Array:
    """[B, D, H, W, C] -> [B, D*H*W, C] (reference hw_flatten, network.py:195)."""
    b = x.shape[0]
    return x.reshape(b, -1, x.shape[-1])


class _ProjParams(nn.Module):
    """Parameter-only twin of a 1x1x1 nn.Conv (kernel+bias, same shapes,
    same init, same scope name) — lets SelfAttention3D fuse the f/g/h
    projections into one GEMM while keeping the checkpoint tree identical
    to three separate convs."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", glorot(), (1, 1, 1, self.in_features, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return kernel, bias


class SelfAttention3D(nn.Module):
    """SAGAN-style global self-attention over D*H*W tokens.

    Parity target: reference utils/network.py:157-193 (see module docstring
    for the subsample-rule derivation).  f/g project to max(1, C//8) channels,
    h to C; ``out = x + gamma * relu(norm(conv(softmax(g f^T) h)))``.
    """

    norm_mode: str = "bn"
    subsample: bool = False
    sub_size: int = 2
    dtype: jnp.dtype | None = None
    axis_name: str | None = None
    # None = auto: use the fused Pallas kernel on TPU when shapes qualify.
    use_pallas: bool | None = None
    # Long-clip sequence parallelism: when set, q/k/v stay sharded on the
    # mesh's time axis and attention runs as a shard_map ring (k/v shards
    # rotate via ppermute with online-softmax combining) instead of the
    # GSPMD all-gather (ops/ring_attention.py).
    ring_mesh: object | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        b, d, h_dim, w, c = x.shape
        inter = max(1, c // 8)

        # The f/g/h 1x1x1 projections: three schemes, selectable via
        # SAP3D_ATTN_PROJ (parameters are IDENTICAL in all three — separate
        # "f"/"g"/"h" submodules, kernel+bias, same init — so checkpoints
        # and the TF importer are unaffected):
        #   "separate" (DEFAULT since r4): three GEMMs, reading x three
        #     times.  Measured on v5e (2026-08-19): inference 538.6 vs
        #     519.2 clips/s fused (+3.7%) and train-step-neutral (103.33
        #     vs 103.64 ms) — the fused path's fp32 accumulator tensor
        #     (~257MB at x_1_3) costs more HBM traffic than the extra
        #     reads of x save.
        #   "fused": one GEMM (c -> inter+inter+c), fp32 accumulator,
        #     split (the round-2 default).
        #   "fused_lowp": the one GEMM emitted at compute dtype (no fp32
        #     intermediate; the MXU still accumulates fp32 internally).
        #     Measured no better than fused at train (103.97 ms).
        import os as _os

        proj_mode = _os.environ.get("SAP3D_ATTN_PROJ", "separate")
        kf, bf = _ProjParams(inter, c, name="f")()
        kg, bg = _ProjParams(inter, c, name="g")()
        kh, bh = _ProjParams(c, c, name="h")()
        if self.dtype is not None:
            xc = x.astype(self.dtype)
        else:
            xc = x

        def _proj(kernel, bias, out_dtype, acc_dtype):
            w2 = kernel[0, 0, 0]
            if self.dtype is not None:
                w2 = w2.astype(self.dtype)
                b2 = bias.astype(self.dtype)
            else:
                w2 = w2.astype(x.dtype)
                b2 = bias.astype(x.dtype)
            y = jnp.einsum(
                "bdhwc,co->bdhwo", xc, w2,
                preferred_element_type=acc_dtype,
            )
            return y.astype(out_dtype) + b2

        if proj_mode == "separate":
            acc = jnp.promote_types(xc.dtype, jnp.float32)
            f = _proj(kf, bf, xc.dtype, acc)
            g = _proj(kg, bg, xc.dtype, acc)
            hv = _proj(kh, bh, xc.dtype, acc)
        else:
            w_cat = jnp.concatenate(
                [kf[0, 0, 0], kg[0, 0, 0], kh[0, 0, 0]], axis=-1
            )  # [c, 2i+c]
            b_cat = jnp.concatenate([bf, bg, bh])
            if self.dtype is not None:
                w_cat = w_cat.astype(self.dtype)
                b_cat = b_cat.astype(self.dtype)
            else:
                w_cat = w_cat.astype(x.dtype)
                b_cat = b_cat.astype(x.dtype)
            acc = (
                xc.dtype if proj_mode == "fused_lowp"
                else jnp.promote_types(xc.dtype, jnp.float32)
            )
            fgh = (
                jnp.einsum(
                    "bdhwc,co->bdhwo", xc, w_cat,
                    preferred_element_type=acc,
                ).astype(xc.dtype)
                + b_cat
            )
            f = fgh[..., :inter]  # keys
            g = fgh[..., inter:2 * inter]  # queries
            hv = fgh[..., 2 * inter:]  # values
        if self.subsample:
            f = pool3d(f, self.sub_size)
            hv = pool3d(hv, self.sub_size)

        q_t, k_t, v_t = map(_flatten_tokens, (g, f, hv))
        if self.ring_mesh is not None:
            from sap3d_tpu.ops.ring_attention import ring_attend_sharded

            o = ring_attend_sharded(self.ring_mesh, q_t, k_t, v_t)
            return self._epilogue(x, o, train)
        use_pallas = self.use_pallas
        use_hybrid = False
        if use_pallas is None:
            import os

            from sap3d_tpu.ops.pallas.flash_attention import (
                flash_attention_viable,
                on_tpu,
            )

            pallas_ok = (
                os.environ.get("SAP3D_DISABLE_PALLAS") != "1" and on_tpu()
            )
            args = (q_t.shape[1], k_t.shape[1], q_t.shape[2], v_t.shape[2])
            use_pallas = pallas_ok and flash_attention_viable(
                *args, itemsize=q_t.dtype.itemsize,
                # inference-only traces never run the kernel backward,
                # so borderline sites need only fit the forward budget
                training=train,
            )
            # Train-mode hybrid (SAP3D_FLASH_HYBRID=1, A/B lever): sites
            # that fit the inference forward budget but not the backward
            # one (the GN decoder's SA sites) run the Pallas forward with
            # a chunked-XLA recompute backward — the flash backward kernel
            # measured -19% at these shapes (BASELINE.md round 5 part C/D)
            # but the forward alone won +10% at inference.
            use_hybrid = (
                not use_pallas and train and pallas_ok
                and os.environ.get("SAP3D_FLASH_HYBRID", "0") == "1"
                and flash_attention_viable(
                    *args, itemsize=q_t.dtype.itemsize, training=False,
                )
            )
        if use_pallas:
            from sap3d_tpu.ops.pallas.flash_attention import flash_attend_tokens

            o = flash_attend_tokens(q_t, k_t, v_t)
        elif use_hybrid:
            from sap3d_tpu.ops.pallas.flash_attention import (
                flash_fwd_chunked_bwd,
            )

            o = flash_fwd_chunked_bwd(q_t, k_t, v_t)
        else:
            o = attend_tokens(q_t, k_t, v_t)
        return self._epilogue(x, o, train)

    def _epilogue(self, x: jax.Array, o: jax.Array, train: bool) -> jax.Array:
        """out-conv -> norm -> relu -> gamma-gated residual (shared tail;
        submodule creation order is identical on every path)."""
        b, d, h_dim, w, c = x.shape
        o = o.reshape(b, d, h_dim, w, c)
        o = nn.Conv(
            c, (1, 1, 1), padding="SAME", kernel_init=glorot(),
            dtype=self.dtype, name="out",
        )(o)
        o = Norm(self.norm_mode, dtype=self.dtype, axis_name=self.axis_name)(o, train)
        o = nn.relu(o)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return x + gamma.astype(x.dtype) * o


class NonLocal3D(nn.Module):
    """Dot-product non-local block (reference utils/network.py:114-154).

    theta/phi/g project to C//2 channels; scores are divided by the key-token
    count (no softmax); the output passes a 1x1x1 conv + BN + ReLU and is
    added to the input.  ``sub_sample=True`` pools keys/values (phi, g) by 2.
    Requires C >= 2.
    """

    norm_mode: str = "bn"
    sub_sample: bool = True
    dtype: jnp.dtype | None = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        b, d, h_dim, w, c = x.shape
        if c < 2:
            raise ValueError(
                f"NonLocal3D needs >=2 channels, got {c} (the reference's "
                "1-channel call site is dead code, see SURVEY.md section 2.2)"
            )
        inter = c // 2

        def conv1(src, feat, name):
            return nn.Conv(
                feat, (1, 1, 1), padding="SAME", kernel_init=glorot(),
                dtype=self.dtype, name=name,
            )(src)

        g_x = conv1(x, inter, "g")
        theta = conv1(x, inter, "theta")
        phi = conv1(x, inter, "phi")
        if self.sub_sample:
            g_x = pool3d(g_x, 2)
            phi = pool3d(phi, 2)

        q = _flatten_tokens(theta)  # [B, Nq, inter]
        k = _flatten_tokens(phi)  # [B, Nk, inter]
        v = _flatten_tokens(g_x)  # [B, Nk, inter]
        acc = jnp.promote_types(q.dtype, jnp.float32)
        scores = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=acc)
        scores = scores / np.float32(k.shape[1])
        y = jnp.einsum(
            "bqk,bkc->bqc", scores.astype(v.dtype), v,
            preferred_element_type=acc,
        ).astype(x.dtype)
        y = y.reshape(b, d, h_dim, w, inter)
        y = nn.Conv(
            c, (1, 1, 1), padding="SAME", kernel_init=glorot(),
            dtype=self.dtype, name="w_y",
        )(y)
        # The reference normalizes W_y with BN regardless of the model's norm
        # mode (reference utils/network.py:150 passes mode='bn').
        y = Norm("bn", dtype=self.dtype, axis_name=self.axis_name)(y, train)
        y = nn.relu(y)
        return x + y
