"""Space-to-depth stem convolution (TPU lever, ``SAP3D_STEM_S2D``).

The encoder stem is a (1,7,7) stride-(1,2,2) conv over 3-channel frames
(models/p3d.py P3DEncoder; reference p3d.py:172).  With C_in=3 the TPU conv
keeps only 3 of 128 contraction lanes busy — the r4 per-site profile measured
it at 5% fwd / 4% f+b MXU efficiency (5.74 ms of a ~103 ms step at batch 16,
/tmp/tpu_r4.log profile_decoder_v2).

This module computes the SAME operator on a 2x2 space-to-depth view of the
input (the MLPerf ResNet stem trick): pack each 2x2 pixel block into the
channel dim (3 -> 12 channels, 112^2 -> 56^2+halo grid) and convolve with the
correspondingly re-blocked kernel, stride 1, VALID.  Because the output grid
of a stride-2 conv IS the 2x2 block grid, the reformulation is exact:

    out[y, x] = sum_{ty,tx,c} W[ty,tx,c] * P[2y+ty, 2x+tx, c]
              = sum_{jy,jx,py,px,c} W[2jy+py, 2jx+px, c] * S[y+jy, x+jx, (py,px,c)]

with P the SAME-padded input, S its 2x2 space-to-depth packing
S[u, v, (py,px,c)] = P[2u+py, 2v+px, c], and j = t//2, p = t%2 splitting each
kernel tap into (block offset, phase).  Odd kernel taps are zero-padded to a
full phase pair (7 -> 8 taps), and P gets one trailing zero row/col so its
length is even — zeros contribute nothing.

The parameter tree ("kernel" [1,kh,kw,cin,f]) is IDENTICAL to the nn.Conv it
replaces, so checkpoints and the TF importer are unaffected; both paths even
draw the same init values.  Exact to fp rounding: tests/test_stem_s2d.py.

MEASURED OUTCOME (v5e, r4 part D, /tmp/tpu_r4.log): REJECTED as a default —
full train step 104.64 ms vs 103.33 baseline (−1.3%), inference also down
(with the head lever: 532.9 vs 538.6 clips/s).  Two effects the isolated
site numbers miss: (a) the real train step never computes the stem's dx
(the input is data), so most of the profiled 5.74 ms f+b site cost does not
exist in-step; (b) the packed 12-channel tensor's minor-most dim occupies
12 of 128 lanes of its (8,128) HBM tile, so the materialized s2d input
costs more memory traffic than the lane-starved MXU passes it removes.
Kept as an equivalence-tested library op; SAP3D_STEM_S2D=1 still selects it.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from sap3d_tpu.ops.layers import glorot


def stem_s2d_enabled() -> bool:
    """Off by default until the full-step A/B on real hardware decides
    (scripts/tpu_round4d.sh); ``SAP3D_STEM_S2D=1`` opts in."""
    return os.environ.get("SAP3D_STEM_S2D", "0") == "1"


def _dim_pads(k: int) -> tuple[int, int]:
    """(lo, hi) padding for one stride-2 spatial dim of even size.

    lo matches XLA SAME padding (total = k-2 for even input, k >= 2); hi adds
    one trailing zero when the padded length would be odd, so the 2x2
    space-to-depth reshape is exact.
    """
    total = max(k - 2, 0)
    lo = total // 2
    hi = 2 * ((k + 1) // 2) - 2 - lo
    return lo, hi


def conv_stem_s2d(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """conv(x, kernel, strides=(1,2,2), SAME) via 2x2 space-to-depth.

    ``x`` is NDHWC with even H and W; ``kernel`` is [1, kh, kw, cin, f]
    (temporal extent 1 — the stem's shape, reference p3d.py:172).
    """
    kd, kh, kw, cin, cout = kernel.shape
    b, t, h, w, c = x.shape
    if kd != 1:
        raise ValueError(f"stem s2d path needs a (1,kh,kw) kernel, got kd={kd}")
    if h % 2 or w % 2:
        raise ValueError(f"stem s2d path needs even H,W, got {h}x{w}")
    jh, jw = (kh + 1) // 2, (kw + 1) // 2

    ph = _dim_pads(kh)
    pw = _dim_pads(kw)
    xp = jnp.pad(x, ((0, 0), (0, 0), ph, pw, (0, 0)))
    hp, wp = xp.shape[2], xp.shape[3]
    # space-to-depth: [B,T,hp,wp,C] -> [B,T,hp/2,wp/2,(py,px,C)]
    s = xp.reshape(b, t, hp // 2, 2, wp // 2, 2, c)
    s = s.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, t, hp // 2, wp // 2, 4 * c)
    # kernel: pad taps to full phase pairs, re-block to [1,jh,jw,(py,px,C),F]
    kp = jnp.pad(kernel, ((0, 0), (0, 2 * jh - kh), (0, 2 * jw - kw),
                          (0, 0), (0, 0)))
    k2 = kp.reshape(1, jh, 2, jw, 2, cin, cout)
    k2 = k2.transpose(0, 1, 3, 2, 4, 5, 6).reshape(1, jh, jw, 4 * cin, cout)
    return jax.lax.conv_general_dilated(
        s, k2, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


class StemConv(nn.Module):
    """The encoder stem conv: (1,kh,kw) stride (1,2,2), SAME, no bias.

    Drop-in for ``nn.Conv(features, (1,k,k), (1,2,2), use_bias=False)`` with
    the identical param tree and init; dispatches to the space-to-depth
    formulation when ``SAP3D_STEM_S2D=1`` and the input shape allows it.
    """

    features: int
    kernel_hw: int = 7
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_hw
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", glorot(), (1, k, k, cin, self.features), jnp.float32
        )
        # same promotion rule as nn.Conv: explicit dtype wins, else the
        # common dtype of input and kernel
        dt = self.dtype or jnp.promote_types(x.dtype, kernel.dtype)
        x = x.astype(dt)
        kernel = kernel.astype(dt)
        if stem_s2d_enabled() and x.shape[2] % 2 == 0 and x.shape[3] % 2 == 0:
            return conv_stem_s2d(x, kernel)
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 2, 2), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
