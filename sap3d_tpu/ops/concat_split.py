"""Concat-free dense-skip convolution (TPU experiment).

The unet++ decoder's heavy conv sites take concatenated skip tensors:
``conv3d(concat([a, b], -1), W)`` (models/p3d.py:359-384; reference
p3d.py:305-330 builds the same ``tf.concat`` -> ``conv3d`` chains).  By
linearity of convolution over input channels this equals
``conv3d(a, W[..., :Ca, :]) + conv3d(b, W[..., Ca:, :])`` — the concat
tensor never has to exist.  At the x_1_* sites ([B,8,56,56,256] bf16,
B=16) each concat is a ~205MB HBM tensor written once and read once per
step (plus its gradient sliced in the backward); if XLA does not fuse the
concat into the conv operand, splitting saves that traffic at identical
FLOPs (the per-part contraction widths stay MXU-friendly multiples of
128).

DEFAULT ON since round 4: the full-step A/B on the v5e measured 103.64 vs
108.67 ms/step (+4.9% clips/s, /tmp/tpu_r4.log 2026-08-19) — XLA does NOT
fuse these concats away.  Opt out with ``SAP3D_CONCAT_SPLIT=0``.
``SplitConcatConv`` declares the
exact same parameters as the ``nn.Conv`` it replaces (one fused kernel
``[kd, kh, kw, sum(Ci), F]`` + bias), so checkpoints and param trees are
unchanged; the kernel is sliced per part at apply time (weights are tiny
next to the activations).  Composes with ``SAP3D_CONV3D_VIA_2D=1``: each
per-part conv then runs the 2-D formulation (ops/conv2d_path.py).

Exact to fp rounding: tests/test_concat_split.py.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def concat_split_enabled() -> bool:
    """Concat-free dense-skip convs are the DEFAULT (measured +4.9% on the
    full train step, v5e r4); ``SAP3D_CONCAT_SPLIT=0`` restores the eager
    concat schedule."""
    return os.environ.get("SAP3D_CONCAT_SPLIT", "1") != "0"


def eager_concat_sites() -> frozenset[str]:
    """Per-site opt-out: ``SAP3D_CONCAT_EAGER_SITES=x_1_1,x_2_1`` forces the
    eager concat schedule at the named decoder sites even while concat-split
    is the global default.  A/B instrument for sites whose per-part channel
    widths are suspected of scheduling worse than the coalesced conv (e.g.
    x_1_1's (64,128) split vs x_1_3's (128,128) — r4 per-site profile put
    x_1_1 at 74% f+b vs x_1_3's 91%).  Param trees are identical either way.
    """
    raw = os.environ.get("SAP3D_CONCAT_EAGER_SITES", "")
    return frozenset(s.strip() for s in raw.split(",") if s.strip())


def conv3d_concat_split(
    parts: Sequence[jax.Array],
    kernel: jax.Array,
    bias: jax.Array | None,
    strides: Sequence[int] = (1, 1, 1),
) -> jax.Array:
    """SAME-padded 3-D conv of channel-concatenated parts, without the concat.

    ``kernel`` is the fused ``[kd, kh, kw, sum(Ci), F]`` weight of the
    equivalent conv over ``concat(parts, -1)``.
    """
    total = sum(p.shape[-1] for p in parts)
    if kernel.shape[3] != total:
        raise ValueError(
            f"kernel expects {kernel.shape[3]} input channels, parts supply "
            f"{total}"
        )
    via_2d = os.environ.get("SAP3D_CONV3D_VIA_2D") == "1" and strides[0] == 1
    if via_2d:
        from sap3d_tpu.ops.conv2d_path import conv3d_via_2d

    out = None
    off = 0
    for p in parts:
        ci = p.shape[-1]
        k_p = jax.lax.slice_in_dim(kernel, off, off + ci, axis=3)
        off += ci
        if via_2d:
            y = conv3d_via_2d(p, k_p, None, tuple(strides))
        else:
            y = jax.lax.conv_general_dilated(
                p, k_p, tuple(strides), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
        out = y if out is None else out + y
    if bias is not None:
        out = out + bias
    return out


class SplitConcatConv(nn.Module):
    """Drop-in for ``nn.Conv`` over ``concat(parts, -1)``, minus the concat.

    Same parameter names/shapes/init as ``nn.Conv`` — construct with
    ``name="Conv_0"`` to keep the param tree identical to the eager-concat
    path.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1, 1)
    padding: str = "SAME"
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, parts: Sequence[jax.Array]) -> jax.Array:
        if self.padding != "SAME":
            raise ValueError("SplitConcatConv is SAME-padding only")
        kd, kh, kw = self.kernel_size
        total = sum(p.shape[-1] for p in parts)
        kernel = self.param(
            "kernel", self.kernel_init,
            (kd, kh, kw, total, self.features), jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
            if self.use_bias else None
        )
        if self.dtype is not None:
            parts = [p.astype(self.dtype) for p in parts]
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype) if bias is not None else None
        return conv3d_concat_split(parts, kernel, bias, tuple(self.strides))
