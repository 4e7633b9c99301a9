"""On-device (JAX) saliency metrics, vectorized over batches of maps.

The reference computes all validation metrics in per-frame Python loops on
host NumPy (reference train.py:247-260) — the validation pass is one of its
hot loops (SURVEY.md section 3.1).  CC / SIM / NSS / KL are pure reductions,
so here they run under jit, batched over [N, H, W] maps, and never leave the
device.

The AUC variants are data-dependent on host (per-frame threshold lists whose
length is the fixation count) but vectorize with STATIC shapes:

* ``auc_judd`` — the threshold sweep is the descending fixation values; the
  sweep is padded to the full pixel count and masked past n_fix (the padded
  (tp=1, fp=1) points contribute zero trapezoid area, exactly like the host
  curve's terminal point, eval/metrics.py:AUC_Judd).
* ``auc_borji`` — after range normalization the saliency values live in
  [0, 1], so the reference's per-rep threshold grid (descending multiples of
  step_size below the rep's max) is subsumed by the static global grid
  arange(0, 1+step, step): thresholds above a rep's max score tp=fp=0 and
  add zero area (same argument as the host vectorization,
  eval/metrics.py:AUC_Borji).  Random negatives are drawn with the JAX PRNG,
  so scores match the host implementation in distribution, not bitwise
  (both are Monte-Carlo over the sampler).

Formulas match eval/metrics.py (and hence the reference) when both maps
already share a shape; resizing-on-mismatch remains a host concern.
"""

from __future__ import annotations

import functools

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


def _trapz_rows(y: jax.Array, x: jax.Array) -> jax.Array:
    """Row-wise trapezoid integral of y over x ([..., K] -> [...])."""
    return jnp.sum(
        0.5 * (y[..., 1:] + y[..., :-1]) * (x[..., 1:] - x[..., :-1]), axis=-1
    )


@functools.partial(jax.jit, static_argnames=("fix_cap",))
def auc_judd(pred: jax.Array, fixations: jax.Array,
             jitter_key: jax.Array | None = None,
             fix_cap: int = 4096) -> jax.Array:
    """Batched AUC-Judd: pred/fixations [N, H, W] -> [N].

    Same curve as eval/metrics.py:AUC_Judd (thresholds at each fixation's
    saliency value, descending); NaN for maps without fixations.  Pass a PRNG
    key to jitter ties like the host's ``jitter=True`` (different stream).
    ``fix_cap`` bounds the static sweep width; frames with more fixations
    than the cap return NaN (raise the cap for such data).
    """
    n, h, w = pred.shape
    p = h * w
    s = pred.astype(jnp.float32).reshape(n, p)
    if jitter_key is not None:
        # The host uses 1e-7 jitter on float64 (eval/metrics.py:AUC_Judd);
        # at float32 that is ~2 ulps of a unit-range map and leaves
        # 8-bit-quantization ties unbroken, which biases AUC low on flat
        # regions.  1e-4 is >800 f32 ulps yet 40x below the 1/255 data
        # quantization, so it breaks ties without reordering distinct values.
        s = s + jax.random.uniform(jitter_key, s.shape) * 1e-4
    f = (fixations > 0.5).reshape(n, p)
    n_fix = jnp.sum(f, axis=1)  # [N]
    cap = min(fix_cap, p)

    s_sorted = jnp.sort(s, axis=1)
    # top-cap fixation saliency values, descending (-inf past n_fix)
    thr, _ = jax.lax.top_k(jnp.where(f, s, -jnp.inf), cap)  # [N, cap]
    above = p - jax.vmap(
        lambda a, v: jnp.searchsorted(a, v, side="left", method="sort")
    )(s_sorted, thr)  # [N, cap]: #{S >= thr_k}

    k = jnp.arange(1, cap + 1, dtype=jnp.float32)
    valid = k[None, :] <= n_fix[:, None]
    nf = jnp.maximum(n_fix, 1).astype(jnp.float32)[:, None]
    tp = jnp.where(valid, k[None, :] / nf, 1.0)
    fp = jnp.where(valid, (above - k[None, :]) / jnp.maximum(p - nf, 1.0), 1.0)
    zeros = jnp.zeros((n, 1), jnp.float32)
    ones = jnp.ones((n, 1), jnp.float32)
    tp = jnp.concatenate([zeros, tp, ones], axis=1)
    fp = jnp.concatenate([zeros, fp, ones], axis=1)
    auc = _trapz_rows(tp, fp)
    # n_fix < p: a frame where every pixel is a fixation has a zero
    # false-positive denominator — the host AUC_Judd yields NaN there and
    # the NaN-filter drops it; match that instead of returning ~1.0.
    return jnp.where((n_fix > 0) & (n_fix <= cap) & (n_fix < p), auc, jnp.nan)


def _range_normalize_rows(pred: jax.Array):
    """Flatten + range-normalize into [0,1]; also report constant rows."""
    n = pred.shape[0]
    s = pred.astype(jnp.float32).reshape(n, -1)
    lo = jnp.min(s, axis=1, keepdims=True)
    hi = jnp.max(s, axis=1, keepdims=True)
    constant = (hi - lo)[:, 0] <= 0
    return (s - lo) / jnp.where(hi > lo, hi - lo, 1.0), constant


def _auc_sampled_negatives(s, f, n_fix, s_rand, step_size):
    """Shared Borji/shuffled curve: tp from the fixation pixels, fp from the
    sampled negatives [N, R, cap] (-inf past each row's n_fix), trapezoid
    over the STATIC global threshold grid (exact after range normalization —
    thresholds above a rep's max add zero area)."""
    n, n_rep, _ = s_rand.shape
    nf = jnp.maximum(n_fix, 1).astype(jnp.float32)
    thresholds = jnp.arange(0.0, 1.0 + step_size, step_size)[::-1]  # [T]

    # tp(t) = #{fixation pixels with s >= t} / n_fix — full-map masked
    # reduction (fused by XLA; [N, T, P] is never materialized)
    s_fix = jnp.where(f, s, -jnp.inf)  # [N, P]
    tp = (
        jnp.sum(s_fix[:, None, :] >= thresholds[None, :, None], axis=2)
        / nf[:, None]
    )  # [N, T]
    fp = (
        jnp.sum(s_rand[:, :, None, :] >= thresholds[None, None, :, None],
                axis=3)
        / nf[:, None, None]
    )  # [N, R, T]

    zeros = jnp.zeros((n, n_rep, 1), jnp.float32)
    ones = jnp.ones((n, n_rep, 1), jnp.float32)
    tp_full = jnp.concatenate(
        [zeros, jnp.broadcast_to(tp[:, None, :], fp.shape), ones], axis=2
    )
    fp_full = jnp.concatenate([zeros, fp, ones], axis=2)
    return jnp.mean(_trapz_rows(tp_full, fp_full), axis=1)  # [N]


@functools.partial(jax.jit, static_argnames=("n_rep", "step_size", "fix_cap"))
def auc_borji(pred: jax.Array, fixations: jax.Array, key: jax.Array,
              n_rep: int = 100, step_size: float = 0.1,
              fix_cap: int = 4096) -> jax.Array:
    """Batched AUC-Borji: pred/fixations [N, H, W] -> [N].

    The reference samples n_fix random pixels per repetition
    (eval/metrics.py:AUC_Borji); here ``fix_cap`` pixels are sampled per rep
    and the first n_fix participate (masked past n_fix), preserving the
    per-rep sample count exactly.  NaN for empty fixation maps, for constant
    saliency maps (host parity), and past the cap.
    """
    n, h, w = pred.shape
    p = h * w
    s, constant = _range_normalize_rows(pred)
    f = (fixations > 0.5).reshape(n, p)
    n_fix = jnp.sum(f, axis=1)  # [N]
    cap = min(fix_cap, p)

    # negatives: cap uniform pixel draws per rep; only the first n_fix count
    idx = jax.random.randint(key, (n, n_rep, cap), 0, p)
    s_rand = jax.vmap(lambda sv, iv: sv[iv])(s, idx)  # [N, R, cap]
    live = jnp.arange(cap)[None, None, :] < n_fix[:, None, None]
    s_rand = jnp.where(live, s_rand, -jnp.inf)

    auc = _auc_sampled_negatives(s, f, n_fix, s_rand, step_size)
    return jnp.where((n_fix > 0) & ~constant & (n_fix <= cap), auc, jnp.nan)


@functools.partial(jax.jit, static_argnames=("n_rep", "step_size", "fix_cap"))
def auc_shuffled(pred: jax.Array, fixations: jax.Array,
                 other_idx: jax.Array, other_count: jax.Array,
                 key: jax.Array, n_rep: int = 100, step_size: float = 0.1,
                 fix_cap: int = 4096) -> jax.Array:
    """Batched shuffled AUC: negatives drawn from OTHER videos' fixation
    locations (host: eval/metrics.py:AUC_shuffled).

    ``other_idx`` is a static-size [M] array of flat pixel indices of the
    cross-video fixation pool (padding beyond ``other_count`` is ignored —
    draws are uniform over the first ``other_count`` entries).  Deviation
    from the host sampler: draws are WITH replacement (the host permutes the
    pool per repetition); for pools much larger than n_fix the distributions
    coincide and scores agree within Monte-Carlo noise.
    """
    n, h, w = pred.shape
    p = h * w
    s, constant = _range_normalize_rows(pred)
    f = (fixations > 0.5).reshape(n, p)
    n_fix = jnp.sum(f, axis=1)  # [N]
    cap = min(fix_cap, p)

    j = jax.random.randint(key, (n, n_rep, cap), 0,
                           jnp.maximum(other_count, 1))
    s_rand = jax.vmap(lambda sv, jv: sv[other_idx[jv]])(s, j)  # [N, R, cap]
    live = jnp.arange(cap)[None, None, :] < n_fix[:, None, None]
    s_rand = jnp.where(live, s_rand, -jnp.inf)

    auc = _auc_sampled_negatives(s, f, n_fix, s_rand, step_size)
    ok = (n_fix > 0) & ~constant & (n_fix <= cap) & (other_count > 0)
    return jnp.where(ok, auc, jnp.nan)
