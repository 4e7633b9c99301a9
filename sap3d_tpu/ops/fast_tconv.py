"""Phase-decomposed transposed convolution (TPU-friendly).

``nn.ConvTranspose`` lowers to an input-dilated convolution: for stride s
the input is zero-interleaved, so the MXU multiplies (s^3 - 1)/s^3 zeros.
XLA on this TPU does not fully recover that waste (measured: the up_2_0
site runs at ~2x the dense-dilated rate, still ~4x off the minimal FLOPs —
scripts/profile_tconv.py).

This module computes the SAME operator as a single dense stride-1
convolution producing s_d*s_h*s_w output phases that are then interleaved
(depth-to-space).

Measured outcome (v5e, BASELINE.md round 2): the phase forward wins in
isolation (2.3ms vs 3.4ms for the up_2_0 shape) but LOSES inside the full
flagship program — XLA fuses the dilated conv with the following
norm/concat while the interleave transposes here break fusion (115.4 vs
109.5 ms/step), so the model family keeps nn.ConvTranspose.  The module
stays as a library op (exact-equivalence tested) for workloads where the
transpose conv is NOT fused into neighbors, e.g. a bare stride-4 head.  Derivation: jax's conv_transpose(SAME, transpose_kernel=
False) is conv_general_dilated with lhs_dilation=s and per-dim padding
(pad_a, pad_b) from lax._conv_transpose_padding; writing out[s*p + e] and
solving (e + t - pad_a) mod s == 0 for the kernel taps t gives, per output
phase e, at most ceil(k/s) contributing taps at input offsets
delta = (e + t - pad_a)/s.  Packing those taps (zeros elsewhere) into a
[A_d, A_h, A_w, in, S*out] kernel (A = window span, S = phase count) yields
an ordinary VALID convolution over the (-delta_min, +delta_max)-padded
input whose channel-blocked output is exactly the transposed conv's phase
decomposition.

The parameter tree ("kernel" [kD,kH,kW,in,out], optional "bias") is
IDENTICAL to nn.ConvTranspose, so checkpoints and the TF-checkpoint
importer (interop/tf_import.py) are unaffected.  Numerical equivalence with
nn.ConvTranspose is asserted per-config in tests/test_fast_tconv.py.
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from sap3d_tpu.ops.layers import glorot


def _dim_plan(k: int, s: int):
    """Per-dim phase plan for conv_transpose SAME (see module docstring).

    Returns (tap_index[s, A], tap_mask[s, A], pad_before, pad_after) where A
    is the input-window span; tap_index[e, a] is the kernel tap feeding
    output phase e from input offset (a + delta_min), masked where no tap
    lands.
    """
    pad_len = k + s - 2
    pad_a = k - 1 if s > k - 1 else -(-pad_len // 2)
    taps = []
    deltas = []
    for e in range(s):
        ph = [(t, (e + t - pad_a) // s) for t in range(k)
              if (e + t - pad_a) % s == 0]
        taps.append(ph)
        deltas += [d for _, d in ph]
    dmin = min(deltas) if deltas else 0
    dmax = max(deltas) if deltas else 0
    A = dmax - dmin + 1
    idx = np.zeros((s, A), np.int32)
    mask = np.zeros((s, A), np.float32)
    for e, ph in enumerate(taps):
        for t, d in ph:
            idx[e, d - dmin] = t
            mask[e, d - dmin] = 1.0
    return idx, mask, -dmin, dmax


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _phase_tconv(x: jax.Array, kernel: jax.Array, strides: tuple) -> jax.Array:
    """conv_transpose(x, kernel, SAME) with a phase-decomposed forward.

    Forward: the packed stride-1 convolution below (no zero-multiplies).
    Backward: the VJP of the *reference* lax.conv_transpose expression —
    its adjoints are plain strided convolutions, which XLA executes near
    roofline, whereas differentiating through the phase forward produces a
    worse-scheduled program (measured +13ms/step).  The two forwards are the
    same operator (tests/test_fast_tconv.py), so the reference VJP is the
    exact gradient of the phase forward.
    """
    return _phase_forward(x, kernel, strides)


def _reference_tconv(x, kernel, strides):
    return jax.lax.conv_transpose(
        x, kernel, strides=strides, padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        transpose_kernel=False,
    )


def _phase_tconv_fwd(x, kernel, strides):
    return _phase_forward(x, kernel, strides), (x, kernel)


def _phase_tconv_bwd(strides, res, dy):
    x, kernel = res
    _, vjp = jax.vjp(lambda x, k: _reference_tconv(x, k, strides), x, kernel)
    # The vjp closure re-traces the reference forward, but its primal output
    # is unused and conv adjoints need only (x, kernel, dy) — XLA dead-code
    # eliminates the dilated forward.
    return vjp(dy)


_phase_tconv.defvjp(_phase_tconv_fwd, _phase_tconv_bwd)


def phase_tconv_pre_interleave(
    x: jax.Array, kernel: jax.Array, strides: tuple
) -> jax.Array:
    """The phase decomposition of conv_transpose(x, kernel, SAME) WITHOUT
    the final interleave: returns [B, D, H, W, S*cout] where phase
    p = (e_d*sh + e_h)*sw + e_w (output-major per phase, cout minor) and
    the interleaved result would be
    ``out[b, d*sd+e_d, h*sh+e_h, w*sw+e_w, c] = y[b, d, h, w, p*cout+c]``.

    This is the whole tconv as one dense stride-1 conv; callers that can
    consume the phase layout directly (e.g. a sum-reduced loss against
    space-to-depth'd targets, train/steps.py) skip the interleave's HBM
    relayout entirely — the lever the r4 part-D head experiment showed is
    the expensive part (the phase CONV itself is the cheap part).
    Differentiable by plain autodiff (no interleave in the graph, so the
    measured backward regression of the interleaved form does not apply).
    """
    kd, kh, kw, cin, cout = kernel.shape
    sd, sh, sw = strides

    id_, md, pb_d, pa_d = _dim_plan(kd, sd)
    ih, mh, pb_h, pa_h = _dim_plan(kh, sh)
    iw, mw, pb_w, pa_w = _dim_plan(kw, sw)
    Ad, Ah, Aw = id_.shape[1], ih.shape[1], iw.shape[1]
    S = sd * sh * sw

    # gather taps -> [sd,sh,sw, Ad,Ah,Aw, in, out], zeroing empty slots
    g = kernel[
        id_[:, None, None, :, None, None],
        ih[None, :, None, None, :, None],
        iw[None, None, :, None, None, :],
    ]
    m = (
        md[:, None, None, :, None, None]
        * mh[None, :, None, None, :, None]
        * mw[None, None, :, None, None, :]
    )
    g = g * jnp.asarray(m, g.dtype)[..., None, None]
    # -> [Ad,Ah,Aw, in, S*out] with phase-major output blocking
    w2 = g.transpose(3, 4, 5, 6, 0, 1, 2, 7).reshape(Ad, Ah, Aw, cin, S * cout)

    xp = jnp.pad(
        x, ((0, 0), (pb_d, pa_d), (pb_h, pa_h), (pb_w, pa_w), (0, 0))
    )
    return jax.lax.conv_general_dilated(
        xp, w2, window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def space_to_depth3d(t: jax.Array, strides: tuple) -> jax.Array:
    """Rearrange [B, D*sd, H*sh, W*sw] -> [B, D, H, W, S] matching
    phase_tconv_pre_interleave's phase order (for cout == 1), so that
    elementwise losses computed in phase layout sum to exactly the same
    set of terms as in interleaved layout."""
    sd, sh, sw = strides
    b, dd, hh, ww = t.shape
    t = t.reshape(b, dd // sd, sd, hh // sh, sh, ww // sw, sw)
    return t.transpose(0, 1, 3, 5, 2, 4, 6).reshape(
        b, dd // sd, hh // sh, ww // sw, sd * sh * sw
    )


def _phase_forward(x: jax.Array, kernel: jax.Array, strides: tuple) -> jax.Array:
    sd, sh, sw = strides
    cout = kernel.shape[-1]
    y = phase_tconv_pre_interleave(x, kernel, strides)
    b, nd, nh, nw, _ = y.shape
    y = y.reshape(b, nd, nh, nw, sd, sh, sw, cout)
    return y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
        b, nd * sd, nh * sh, nw * sw, cout
    )


def phase_head_loss_enabled() -> bool:
    """SAP3D_HEAD_PHASE_LOSS=1 computes the training loss against the 'ds'
    head's PHASE-layout output ([B,8,56,56,8]) with space-to-depth'd
    targets, instead of interleaving the prediction to [B,16,112,112,1].
    The sum-reduced smooth-L1 is permutation-invariant, so the loss (and
    every parameter gradient) is mathematically identical — but the
    C_out=1 interleaved tconv (127/128 MXU output lanes idle, r4 per-site
    profile: 10-14% efficiency) becomes a C_out=8 dense conv and the
    interleave's HBM relayout (the measured killer of the part-D head
    lever) disappears from the train graph.  Eval/predict paths are
    untouched (they need the real saliency map).

    Default ON since round 5: the full-step A/B measured 100.34 / 101.24
    ms/step (two idle-host sessions, 2026-08-20) vs a 103.17-104.54
    reference band — a ~3% win well outside the measured run-to-run
    spread.  (The companion x_1_1 eager-coalesce lever measured inside
    the band alone, and WORSE than phase-loss alone when combined —
    102.69/108.49 — so it stays off; see BASELINE.md round 5.)
    Opt out with SAP3D_HEAD_PHASE_LOSS=0."""
    return os.environ.get("SAP3D_HEAD_PHASE_LOSS", "1") == "1"


class PhaseHeadTConv(nn.Module):
    """Same params as nn.ConvTranspose (SAME), but returns the PHASE layout
    [B, D, H, W, S*features] — see phase_tconv_pre_interleave.  Used by the
    'ds' saliency head under SAP3D_HEAD_PHASE_LOSS (train mode only)."""

    features: int
    kernel_size: tuple
    strides: tuple
    use_bias: bool = True
    dtype: jnp.dtype | None = None
    kernel_init: nn.initializers.Initializer = glorot()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kd, kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init,
            (kd, kh, kw, cin, self.features), jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
            if self.use_bias else None
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        else:
            kernel = kernel.astype(x.dtype)
        y = phase_tconv_pre_interleave(x, kernel, tuple(self.strides))
        if bias is not None:
            # every phase of an output channel shares that channel's bias
            b = jnp.tile(bias.astype(y.dtype), int(np.prod(self.strides)))
            y = y + b
        return y


class FastConvTranspose(nn.Module):
    """Drop-in nn.ConvTranspose (SAME padding) via phase decomposition."""

    features: int
    kernel_size: tuple
    strides: tuple
    use_bias: bool = True
    dtype: jnp.dtype | None = None
    kernel_init: nn.initializers.Initializer = glorot()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kd, kh, kw = self.kernel_size
        sd, sh, sw = self.strides
        cin = x.shape[-1]
        cout = self.features
        kernel = self.param(
            "kernel", self.kernel_init, (kd, kh, kw, cin, cout), jnp.float32
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (cout,), jnp.float32)
            if self.use_bias else None
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype) if bias is not None else None
        else:
            kernel = kernel.astype(x.dtype)
            bias = bias.astype(x.dtype) if bias is not None else None

        y = _phase_tconv(x, kernel, (sd, sh, sw))
        if bias is not None:
            y = y + bias
        return y
