"""3-D convolution expressed as one 2-D convolution (TPU experiment).

A [kd, kh, kw] conv over [B, D, H, W, C] with unit temporal stride equals a
single [kh, kw] 2-D conv over [B*D, H, W, kd*C] where the channel blocks are
the kd temporally-shifted copies of the input (zero-padded at the clip
edges, i.e. TF-SAME in D).  The decoder's heavy conv sites
(x_1_*/x_2_*/x_3_1, models/p3d.py:359-384, reference p3d.py:305-330) carry
~55% of the train step's FLOPs, and XLA's 2-D TPU conv path is its most
tuned; this module lets those sites run through it, flag-gated
(``SAP3D_CONV3D_VIA_2D=1``) until measured.

``Conv3DVia2D`` declares the exact same parameters as ``nn.Conv``
(``kernel [kd, kh, kw, C, F]`` + ``bias [F]``), so checkpoints and param
trees are unchanged; only the compute schedule differs (exact to fp
rounding, tests/test_conv2d_path.py).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def conv3d_via_2d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None,
    strides: Sequence[int] = (1, 1, 1),
) -> jax.Array:
    """SAME-padded 3-D conv computed as one 2-D conv (unit D stride only)."""
    kd, kh, kw, cin, f = kernel.shape
    sd, sh, sw = strides
    if sd != 1:
        raise ValueError("conv3d_via_2d supports unit temporal stride only")
    b, d, h, w, c = x.shape
    if kd > 1:
        # TF-SAME temporal padding: total kd-1, front (kd-1)//2
        front = (kd - 1) // 2
        xp = jnp.pad(x, ((0, 0), (front, kd - 1 - front), (0, 0), (0, 0),
                         (0, 0)))
        # kd temporally shifted views, stacked on channels (t-major blocks)
        x = jnp.concatenate([xp[:, t:t + d] for t in range(kd)], axis=-1)
    x2 = x.reshape(b * d, h, w, kd * c)
    # [kd, kh, kw, C, F] -> [kh, kw, kd*C, F] with the same t-major blocks
    k2 = jnp.transpose(kernel, (1, 2, 0, 3, 4)).reshape(kh, kw, kd * cin, f)
    y = jax.lax.conv_general_dilated(
        x2, k2, (sh, sw), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y.reshape(b, d, y.shape[1], y.shape[2], f)
    if bias is not None:
        y = y + bias
    return y


class Conv3DVia2D(nn.Module):
    """Drop-in for ``nn.Conv`` (3-D, SAME) running the 2-D formulation.

    Same parameter names/shapes/init as ``nn.Conv`` — construct with
    ``name="Conv_0"`` to keep the param tree identical.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1, 1)
    padding: str = "SAME"
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.padding != "SAME":
            raise ValueError("Conv3DVia2D is SAME-padding only")
        kd, kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init,
            (kd, kh, kw, x.shape[-1], self.features), jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
            if self.use_bias else None
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype) if bias is not None else None
        return conv3d_via_2d(x, kernel, bias, tuple(self.strides))
