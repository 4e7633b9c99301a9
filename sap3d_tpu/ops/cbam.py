"""CBAM (channel + spatial attention) and SE blocks for 5D NDHWC tensors.

Parity target: reference utils/network.py:198-274 (a second copy lives at
reference utils/cbam.py:51-128).  The channel attention applies one shared
two-layer MLP to both the global-average and global-max pooled descriptors,
sums, sigmoids, and scales; the spatial attention concatenates channel-mean
and channel-max maps, runs a 7x7x7 conv (no bias), sigmoids, and scales.

These are HBM-bandwidth-bound elementwise/reduce ops; XLA fuses the pools
with the surrounding convs, so no hand-written kernel is needed here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

# tf.contrib.layers.variance_scaling_initializer(): factor=2.0, FAN_IN,
# truncated normal (reference utils/network.py:210).
vs_init = nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")


class ChannelAttention3D(nn.Module):
    """Shared-MLP channel attention (reference utils/network.py:208-249)."""

    ratio: int = 8
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        mlp0 = nn.Dense(
            max(1, c // self.ratio), kernel_init=vs_init, dtype=self.dtype,
            name="mlp_0",
        )
        mlp1 = nn.Dense(c, kernel_init=vs_init, dtype=self.dtype, name="mlp_1")

        avg = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        mx = jnp.max(x, axis=(1, 2, 3), keepdims=True)
        avg = mlp1(nn.relu(mlp0(avg)))
        mx = mlp1(nn.relu(mlp0(mx)))
        scale = nn.sigmoid(avg + mx)
        return x * scale


class SpatialAttention3D(nn.Module):
    """7x7x7-conv spatial attention (reference utils/network.py:251-274)."""

    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        cat = jnp.concatenate([avg, mx], axis=-1)
        attn = nn.Conv(
            1, (7, 7, 7), padding="SAME", use_bias=False, kernel_init=vs_init,
            dtype=self.dtype, name="conv3d",
        )(cat)
        return x * nn.sigmoid(attn)


class CBAM(nn.Module):
    """Channel attention then spatial attention (reference network.py:198-206)."""

    ratio: int = 8
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = ChannelAttention3D(self.ratio, dtype=self.dtype, name="ch_at")(x)
        x = SpatialAttention3D(dtype=self.dtype, name="sp_at")(x)
        return x


class SEBlock3D(nn.Module):
    """Squeeze-and-excitation over NDHWC.

    The reference's SE block (reference utils/cbam.py:20-48) reduces over 2D
    axes [1,2] and is unused/broken on the 5D tensors the models produce; this
    is the corrected 3D version, kept for component-inventory completeness.
    """

    ratio: int = 8
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        s = nn.relu(
            nn.Dense(max(1, c // self.ratio), kernel_init=vs_init,
                     dtype=self.dtype, name="squeeze")(s)
        )
        s = nn.sigmoid(
            nn.Dense(c, kernel_init=vs_init, dtype=self.dtype, name="excite")(s)
        )
        return x * s
