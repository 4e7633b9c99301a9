"""On-device (JAX) saliency metrics, vectorized over batches of maps.

The reference computes all validation metrics in per-frame Python loops on
host NumPy (reference train.py:247-260) — the validation pass is one of its
hot loops (SURVEY.md section 3.1).  CC / SIM / NSS / KL are pure reductions,
so here they run under jit, batched over [N, H, W] maps, and never leave the
device.  AUC variants need data-dependent sorting/thresholds and stay on host
(eval/metrics.py).

Formulas match eval/metrics.py (and hence the reference) when both maps
already share a shape; resizing-on-mismatch remains a host concern.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS_KL = 2.2204e-16


def _standardize(x: jax.Array) -> jax.Array:
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=(-2, -1), keepdims=True)
    std = jnp.std(x, axis=(-2, -1), keepdims=True)
    return (x - mean) / std


@jax.jit
def cc(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Pearson correlation per map: [..., H, W] x 2 -> [...]."""
    p = _standardize(pred)
    g = _standardize(gt)
    n = pred.shape[-1] * pred.shape[-2]
    return jnp.sum(p * g, axis=(-2, -1)) / n


@jax.jit
def sim(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Histogram intersection per map after range+sum normalization."""

    def norm(x):
        x = x.astype(jnp.float32)
        lo = jnp.min(x, axis=(-2, -1), keepdims=True)
        hi = jnp.max(x, axis=(-2, -1), keepdims=True)
        x = (x - lo) / (hi - lo)
        return x / jnp.sum(x, axis=(-2, -1), keepdims=True)

    return jnp.sum(jnp.minimum(norm(pred), norm(gt)), axis=(-2, -1))


@jax.jit
def nss(pred: jax.Array, fixations: jax.Array) -> jax.Array:
    """Mean standardized saliency at fixation points (fixations binarized > 0.5).

    Returns NaN for maps with no fixations, matching host behavior.
    """
    p = _standardize(pred)
    f = (fixations > 0.5).astype(jnp.float32)
    count = jnp.sum(f, axis=(-2, -1))
    total = jnp.sum(p * f, axis=(-2, -1))
    return jnp.where(count > 0, total / count, jnp.nan)


@jax.jit
def kldiv(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """KL divergence of sum-normalized maps (same eps as the reference)."""

    def norm(x):
        x = x.astype(jnp.float32)
        s = jnp.sum(x, axis=(-2, -1), keepdims=True)
        return jnp.where(s > 0, x / s, x)

    p = norm(pred)
    g = norm(gt)
    return jnp.sum(g * jnp.log(_EPS_KL + g / (p + _EPS_KL)), axis=(-2, -1))


@jax.jit
def nan_filtered_mean(x: jax.Array) -> jax.Array:
    """Mean ignoring NaNs (the reference's reporting reduction)."""
    mask = ~jnp.isnan(x)
    return jnp.sum(jnp.where(mask, x, 0.0)) / jnp.maximum(jnp.sum(mask), 1)
