"""Core op library: pooling, normalization, conv blocks, losses.

TPU-native re-implementation of the reference op library
(reference utils/network.py).  Everything is NDHWC, 'SAME' padded, and shaped
so XLA can tile the convolutions onto the MXU; elementwise epilogues
(norm + relu) are left to XLA fusion.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# tf.layers.conv3d / conv3d_transpose and the reference's hand-rolled
# get_conv_weight (reference p3d.py:10-16) all use Xavier/Glorot-uniform init.
glorot = nn.initializers.glorot_uniform


def _triple(v) -> tuple[int, int, int]:
    if isinstance(v, int):
        return (v, v, v)
    t = tuple(int(x) for x in v)
    assert len(t) == 3
    return t


def max_pool3d(
    x: jax.Array,
    window: Sequence[int] | int,
    strides: Sequence[int] | int,
    padding: str = "SAME",
) -> jax.Array:
    """3D max pool over the D,H,W axes of an NDHWC tensor.

    Covers the reference's tf.nn.max_pool3d calls, e.g. the asymmetric stem
    pool with window (2,3,3) stride (2,2,2) (reference p3d.py:177) and the
    temporal (2,1,1)/(2,1,1) pools between stages (reference p3d.py:183-195).
    """
    w = _triple(window)
    s = _triple(strides)
    # flax's max_pool lowers to the reduce_window-max special case that has a
    # registered (select-and-scatter) gradient; a generic reduce_window with
    # an array init value does not.
    return nn.max_pool(x, window_shape=w, strides=s, padding=padding)


def pool3d(x: jax.Array, sub_size: int) -> jax.Array:
    """Cubic max-pool, kernel == stride == sub_size, VALID padding.

    Mirrors tf.layers.max_pooling3d(value, sub_size, sub_size) whose default
    padding is 'valid' (reference utils/network.py:6-7).  sub_size == 1 is the
    identity, matching the reference's pool3d(g, sub_size/2) call with
    sub_size=2 (reference utils/network.py:183).
    """
    if sub_size == 1:
        return x
    return max_pool3d(x, sub_size, sub_size, padding="VALID")


def unpool_zero_interleave(x: jax.Array, axes: Sequence[int] = (1, 2, 3)) -> jax.Array:
    """Dosovitskiy-style zero-interleave 2x upsampling along the given axes.

    Equivalent of the reference's `unpool`/`unpool3D` (reference
    utils/network.py:9-46; unused by any live model there, provided for
    completeness).  Each size-d axis becomes size-2d with zeros in the odd
    positions.
    """
    for ax in axes:
        zeros = jnp.zeros_like(x)
        stacked = jnp.stack([x, zeros], axis=ax + 1)
        new_shape = list(x.shape)
        new_shape[ax] *= 2
        x = stacked.reshape(new_shape)
    return x


def smooth_l1_loss(
    pred: jax.Array,
    target: jax.Array,
    inside_weights: jax.Array | float = 1.0,
    outside_weights: jax.Array | float = 1.0,
    sigma: float = 1.0,
) -> jax.Array:
    """Huber-style smooth-L1, summed over ALL elements.

    Formula parity with reference utils/network.py:49-62, including the final
    reduction: tf.reduce_mean(tf.reduce_sum(err)) there collapses to a plain
    sum over every element of the batch — the rebuild must match this scaling
    to reproduce reference loss magnitudes (SURVEY.md section 2.2).

    The quadratic/linear switch factor is treated as a constant w.r.t.
    gradients (tf.stop_gradient in the reference).
    """
    sigma2 = sigma**2
    diff = (pred - target) * inside_weights
    abs_diff = jnp.abs(diff)
    is_small = jax.lax.stop_gradient((abs_diff < 1.0 / sigma2).astype(diff.dtype))
    per_elem = (diff**2) * (sigma2 / 2.0) * is_small + (abs_diff - 0.5 / sigma2) * (
        1.0 - is_small
    )
    return jnp.sum(per_elem * outside_weights)


class Norm(nn.Module):
    """Dispatch BatchNorm vs GroupNorm (reference utils/network.py:89-94).

    * mode='bn': tf.layers.batch_normalization parity — momentum 0.99,
      epsilon 1e-3, moving stats tracked in the 'batch_stats' collection.
      ``axis_name`` optionally syncs batch stats across a data-parallel mesh
      axis (the reference/TF1 used per-replica stats; off by default).
    * mode='gn': GroupNorm with G=min(32, C), eps 1e-5
      (reference utils/network.py:65-87).
    * mode='none': identity.
    """

    mode: str = "bn"
    dtype: jnp.dtype | None = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.mode == "bn":
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-3,
                dtype=self.dtype,
                axis_name=self.axis_name if train else None,
            )(x)
        if self.mode == "gn":
            c = x.shape[-1]
            return nn.GroupNorm(
                num_groups=min(32, c), epsilon=1e-5, dtype=self.dtype
            )(x)
        if self.mode == "none":
            return x
        raise ValueError(f"unknown norm mode {self.mode!r}")


class ConvNormRelu(nn.Module):
    """conv3d -> norm -> relu (reference utils/network.py:100-104)."""

    features: int
    kernel: Sequence[int] | int = 3
    strides: Sequence[int] | int = 1
    norm_mode: str = "bn"
    use_bias: bool = True
    dtype: jnp.dtype | None = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool) -> jax.Array:
        kernel = _triple(self.kernel)
        strides = _triple(self.strides)
        # ``x`` may be a tuple of channel-concat parts (the decoders' lazy
        # dense-skip concats, models/p3d.py:_cat).  By default the conv
        # runs per part and sums — the concat tensor never materializes
        # (ops/concat_split.py, exact math, same params, measured +4.9%
        # full-step on v5e); SAP3D_CONCAT_SPLIT=0 concatenates eagerly.
        if isinstance(x, (tuple, list)):
            from sap3d_tpu.ops.concat_split import (
                SplitConcatConv,
                concat_split_enabled,
            )

            assert concat_split_enabled()  # _cat only yields tuples when on
            conv_cls = SplitConcatConv
        else:
            # Experimental 2-D formulation of the 3-D conv (same params,
            # exact math, ops/conv2d_path.py); opt-in — the r4 full-step A/B
            # measured it a 30% REGRESSION (152.6 vs 108.7 ms), kept only
            # as a recorded experiment.
            if os.environ.get("SAP3D_CONV3D_VIA_2D") == "1" \
                    and strides[0] == 1:
                from sap3d_tpu.ops.conv2d_path import Conv3DVia2D

                conv_cls = Conv3DVia2D
            else:
                conv_cls = nn.Conv
        x = conv_cls(
            self.features,
            kernel_size=kernel,
            strides=strides,
            padding="SAME",
            use_bias=self.use_bias,
            kernel_init=glorot(),
            dtype=self.dtype,
            name="Conv_0" if conv_cls is not nn.Conv else None,
        )(x)
        x = Norm(self.norm_mode, dtype=self.dtype, axis_name=self.axis_name)(x, train)
        return nn.relu(x)


class TransposeConvNormRelu(nn.Module):
    """conv3d_transpose -> norm -> relu (reference utils/network.py:106-110).

    'SAME' padding: output spatial dims = input * stride, matching
    tf.layers.conv3d_transpose 'same' semantics (e.g. kernel (1,3,3) stride
    (2,2,2) at reference p3d.py:200 maps 1x7x7 -> 2x14x14).
    """

    features: int
    kernel: Sequence[int] | int = 3
    strides: Sequence[int] | int = 2
    norm_mode: str = "bn"
    use_bias: bool = True
    dtype: jnp.dtype | None = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        # nn.ConvTranspose on purpose — see models/p3d.py:_tconv for the
        # measured comparison against the phase-decomposed alternative.
        x = nn.ConvTranspose(
            self.features,
            kernel_size=_triple(self.kernel),
            strides=_triple(self.strides),
            padding="SAME",
            use_bias=self.use_bias,
            kernel_init=glorot(),
            dtype=self.dtype,
        )(x)
        x = Norm(self.norm_mode, dtype=self.dtype, axis_name=self.axis_name)(x, train)
        return nn.relu(x)
