"""Metric parity tests: vectorized implementations vs direct transcriptions
of the reference formulas (reference utils/metrics.py), and the JAX on-device
versions vs the host versions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sap3d_tpu.eval import metrics as M
from sap3d_tpu.eval import metrics_jax as MJ


def _maps(seed=0, shape=(32, 48)):
    rng = np.random.default_rng(seed)
    sal = rng.random(shape)
    fix = (rng.random(shape) < 0.02).astype(np.float64)
    if not fix.any():
        fix.flat[0] = 1.0
    return sal, fix


# ---------------------------------------------------------------------------
# Direct transcriptions of the reference loops (oracles)
# ---------------------------------------------------------------------------


def _auc_judd_reference_loop(saliency_map, fixation_map):
    """Line-for-line port of reference utils/metrics.py:69-85 (no jitter)."""
    S = saliency_map.ravel()
    F = fixation_map.ravel() > 0.5
    S_fix = S[F]
    n_fix = len(S_fix)
    n_pixels = len(S)
    thresholds = sorted(S_fix, reverse=True)
    tp = np.zeros(len(thresholds) + 2)
    fp = np.zeros(len(thresholds) + 2)
    tp[0] = 0
    tp[-1] = 1
    fp[0] = 0
    fp[-1] = 1
    for k, thresh in enumerate(thresholds):
        above_th = np.sum(S >= thresh)
        tp[k + 1] = (k + 1) / float(n_fix)
        fp[k + 1] = (above_th - k - 1) / float(n_pixels - n_fix)
    return np.trapezoid(tp, fp)


def test_auc_judd_matches_reference_loop():
    for seed in range(5):
        sal, fix = _maps(seed)
        got = M.AUC_Judd(sal, fix, jitter=False)
        want = _auc_judd_reference_loop(sal, fix)
        assert got == pytest.approx(want, abs=1e-12)


def test_auc_judd_with_ties():
    """Constant-block maps exercise the >= tie-handling the searchsorted path
    must reproduce exactly."""
    sal = np.zeros((10, 10))
    sal[:5] = 0.5
    sal[7:] = 0.9
    fix = np.zeros((10, 10))
    fix[8, 3] = 1
    fix[2, 2] = 1
    got = M.AUC_Judd(sal, fix, jitter=False)
    want = _auc_judd_reference_loop(sal, fix)
    assert got == pytest.approx(want, abs=1e-12)


def test_auc_judd_perfect_and_empty():
    sal, fix = _maps(1)
    assert np.isnan(M.AUC_Judd(sal, np.zeros_like(fix)))
    # a saliency map equal to the fixation map scores ~1
    assert M.AUC_Judd(fix + 0.0, fix, jitter=False) > 0.97


def _auc_borji_reference_loop(saliency_map, fixation_map, n_rep, step_size,
                              rand_sampler):
    """Line-for-line port of reference utils/metrics.py:119-154 (range
    normalize, sampled negatives via the injected sampler, the exact
    np.r_[0:max:step][::-1] threshold grid, per-threshold tp/fp loops)."""
    saliency_map = np.array(saliency_map, copy=False)
    fixation_map = np.array(fixation_map, copy=False) > 0.5
    if not np.any(fixation_map):
        return np.nan
    saliency_map = (saliency_map - saliency_map.min()) / (
        saliency_map.max() - saliency_map.min()
    )
    S = saliency_map.ravel()
    F = fixation_map.ravel()
    S_fix = S[F]
    n_fix = len(S_fix)
    S_rand = rand_sampler(S, F, n_rep, n_fix)
    auc = np.zeros(n_rep) * np.nan
    for rep in range(n_rep):
        thresholds = np.r_[0:np.max(np.r_[S_fix, S_rand[:, rep]]):step_size][::-1]
        tp = np.zeros(len(thresholds) + 2)
        fp = np.zeros(len(thresholds) + 2)
        tp[0] = 0
        tp[-1] = 1
        fp[0] = 0
        fp[-1] = 1
        for k, thresh in enumerate(thresholds):
            tp[k + 1] = np.sum(S_fix >= thresh) / float(n_fix)
            fp[k + 1] = np.sum(S_rand[:, rep] >= thresh) / float(n_fix)
        auc[rep] = np.trapezoid(tp, fp)
    return np.mean(auc)


def _seeded_uniform_sampler(seed):
    def sampler(S, F, n_rep, n_fix):
        r = np.random.default_rng(seed).integers(
            0, len(S), size=(n_fix, n_rep)
        )
        return S[r]

    return sampler


def test_auc_borji_matches_reference_loop():
    """Element-exact vs the transcription over >= 5 seeds, with the SAME
    sampled negatives injected into both (the only stochastic input)."""
    for seed in range(6):
        sal, fix = _maps(seed)
        sampler = _seeded_uniform_sampler(seed + 100)
        got = M.AUC_Borji(sal, fix, n_rep=12, step_size=0.1,
                          rand_sampler=sampler)
        want = _auc_borji_reference_loop(sal, fix, 12, 0.1, sampler)
        assert got == pytest.approx(want, abs=1e-12), seed


def test_auc_borji_threshold_grid_edge():
    """max exactly on a step multiple: np.r_[0:max:step] EXCLUDES the stop,
    the vectorized arange grid must too."""
    sal = np.zeros((8, 8))
    sal[0, 0] = 1.0  # range-normalized max == 1.0 == 10 * 0.1
    sal[1, 1] = 0.5
    fix = np.zeros((8, 8))
    fix[0, 0] = 1
    fix[1, 1] = 1
    sampler = _seeded_uniform_sampler(7)
    got = M.AUC_Borji(sal, fix, n_rep=5, step_size=0.1, rand_sampler=sampler)
    want = _auc_borji_reference_loop(sal, fix, 5, 0.1, sampler)
    assert got == pytest.approx(want, abs=1e-12)


def test_auc_shuffled_matches_reference_loop():
    """AUC_shuffled == AUC_Borji with the other-image fixation sampler
    (reference utils/metrics.py:190-197); oracle gets the identical
    permutation stream by seeding the same Generator."""
    for seed in range(5):
        sal, fix = _maps(seed)
        _, other = _maps(seed + 50)

        def make_sampler(s):
            def sample_other(S, F, n_rep, n_fix):
                # transcription of reference metrics.py:191-196 with seeded rng
                r = np.random.default_rng(s)
                fixated = np.nonzero(other.ravel() > 0.5)[0]
                indexer = [
                    r.permutation(len(fixated))[:n_fix] for _ in range(n_rep)
                ]
                return S[fixated[np.transpose(indexer)]]

            return sample_other

        got = M.AUC_shuffled(sal, fix, other, n_rep=8,
                             rng=np.random.default_rng(seed + 200))
        # our implementation must equal Borji-with-other-sampler when fed the
        # same permutations
        want = _auc_borji_reference_loop(
            sal, fix, 8, 0.1, make_sampler(seed + 200)
        )
        # independently, the oracle with OUR sampler's exact draws:
        ours_again = M.AUC_Borji(
            sal, fix, n_rep=8, step_size=0.1,
            rand_sampler=make_sampler(seed + 200),
        )
        assert ours_again == pytest.approx(want, abs=1e-12), seed
        # and the public AUC_shuffled entry point agrees (same rng stream)
        assert got == pytest.approx(want, abs=1e-12), seed


def test_auc_borji_range():
    sal, fix = _maps(2)
    v = M.AUC_Borji(sal, fix, n_rep=20, rng=np.random.default_rng(0))
    assert 0.2 < v < 0.8  # random map ~ chance
    good = M.AUC_Borji(fix + 1e-3, fix, n_rep=20, rng=np.random.default_rng(0))
    assert good > 0.9


def test_auc_shuffled_runs():
    sal, fix = _maps(3)
    _, other = _maps(4)
    v = M.AUC_shuffled(sal, fix, other, n_rep=10, rng=np.random.default_rng(0))
    assert 0.0 <= v <= 1.0


def test_nss_oracle():
    sal, fix = _maps(5)
    s = (sal - sal.mean()) / sal.std()
    want = s[fix > 0.5].mean()
    assert M.NSS(sal, fix) == pytest.approx(want, rel=1e-12)


def test_cc_oracle_and_selfcorrelation():
    sal, _ = _maps(6)
    sal2, _ = _maps(7)
    want = np.corrcoef(sal.ravel(), sal2.ravel())[0, 1]
    assert M.CC(sal, sal2) == pytest.approx(want, rel=1e-10)
    assert M.CC(sal, sal * 3 + 1) == pytest.approx(1.0, abs=1e-10)


def test_sim_oracle():
    sal, _ = _maps(8)
    assert M.SIM(sal, sal) == pytest.approx(1.0, abs=1e-10)
    sal2, _ = _maps(9)
    v = M.SIM(sal, sal2)
    assert 0 < v < 1


def test_kldiv_zero_for_identical():
    sal, _ = _maps(10)
    assert M.KLdiv(sal, sal) == pytest.approx(0.0, abs=1e-5)
    sal2, _ = _maps(11)
    assert M.KLdiv(sal, sal2) > 0


def test_resize_on_mismatch():
    sal = np.random.default_rng(12).random((20, 20))
    gt = np.random.default_rng(13).random((32, 48))
    # should not raise; prediction resized to GT shape
    for fn in (M.CC, M.SIM, M.KLdiv):
        assert np.isfinite(fn(sal, gt))
    fix = (gt > 0.97).astype(float)
    assert np.isfinite(M.NSS(sal, fix))
    assert np.isfinite(M.AUC_Judd(sal, fix, jitter=False))


def test_nan_filtered_mean():
    assert M.nan_filtered_mean([1.0, np.nan, 3.0]) == pytest.approx(2.0)
    assert np.isnan(M.nan_filtered_mean([np.nan]))


# ---------------------------------------------------------------------------
# JAX on-device versions agree with host versions
# ---------------------------------------------------------------------------


def test_jax_metrics_match_host():
    rng = np.random.default_rng(20)
    pred = rng.random((4, 24, 24)).astype(np.float32)
    gt = rng.random((4, 24, 24)).astype(np.float32)
    fix = (rng.random((4, 24, 24)) < 0.05).astype(np.float32)
    fix[:, 0, 0] = 1.0

    jp, jg, jf = map(jnp.asarray, (pred, gt, fix))
    cc_j = np.asarray(MJ.cc(jp, jg))
    sim_j = np.asarray(MJ.sim(jp, jg))
    nss_j = np.asarray(MJ.nss(jp, jf))
    kl_j = np.asarray(MJ.kldiv(jp, jg))
    for i in range(4):
        assert cc_j[i] == pytest.approx(M.CC(pred[i], gt[i]), abs=1e-4)
        assert sim_j[i] == pytest.approx(M.SIM(pred[i], gt[i]), abs=1e-4)
        assert nss_j[i] == pytest.approx(M.NSS(pred[i], fix[i]), abs=1e-3)
        assert kl_j[i] == pytest.approx(M.KLdiv(pred[i], gt[i]), abs=1e-3)


def test_jax_nss_empty_fixations_nan():
    pred = jnp.ones((1, 8, 8))
    fix = jnp.zeros((1, 8, 8))
    assert np.isnan(np.asarray(MJ.nss(pred, fix))[0])
    assert np.asarray(MJ.nan_filtered_mean(jnp.array([1.0, jnp.nan, 3.0]))) == (
        pytest.approx(2.0)
    )


def test_jax_auc_judd_matches_host():
    """Device AUC-Judd equals the host curve exactly (jitter off, continuous
    maps so no ties)."""
    rng = np.random.default_rng(21)
    pred = rng.random((3, 20, 26))
    fix = (rng.random((3, 20, 26)) < 0.04).astype(np.float32)
    fix[:, 3, 5] = 1.0
    got = np.asarray(MJ.auc_judd(jnp.asarray(pred), jnp.asarray(fix)))
    for i in range(3):
        want = M.AUC_Judd(pred[i], fix[i], jitter=False)
        assert got[i] == pytest.approx(want, abs=1e-5)


def test_jax_auc_judd_empty_and_cap():
    pred = jnp.asarray(np.random.default_rng(0).random((2, 8, 8)))
    fix = np.zeros((2, 8, 8), np.float32)
    fix[1] = 1.0  # 64 fixations > cap 4 -> NaN
    got = np.asarray(MJ.auc_judd(pred, jnp.asarray(fix), fix_cap=4))
    assert np.isnan(got).all()


def test_jax_auc_borji_matches_host_distribution():
    """Monte-Carlo samplers differ (jax vs numpy PRNG); means must agree
    within sampling noise, and degenerate cases must be NaN like the host."""
    rng = np.random.default_rng(22)
    base = rng.random((1, 24, 24))
    # saliency correlated with fixations => AUC well above 0.5
    fix = (base > 0.9).astype(np.float32)
    pred = base + rng.random((1, 24, 24)) * 0.1
    got = np.asarray(
        MJ.auc_borji(jnp.asarray(pred), jnp.asarray(fix),
                     jax.random.PRNGKey(0), n_rep=400)
    )[0]
    want = M.AUC_Borji(pred[0], fix[0], n_rep=400,
                       rng=np.random.default_rng(5))
    assert got == pytest.approx(want, abs=0.02)

    const = jnp.ones((1, 24, 24))
    assert np.isnan(np.asarray(
        MJ.auc_borji(const, jnp.asarray(fix), jax.random.PRNGKey(0))
    ))[0]
    nofix = jnp.zeros((1, 24, 24))
    assert np.isnan(np.asarray(
        MJ.auc_borji(jnp.asarray(pred), nofix, jax.random.PRNGKey(0))
    ))[0]


def test_auc_borji_empty_negative_pool_nan():
    """A sampler with zero negatives must yield NaN, not crash (the per-rep
    loop this vectorization replaced produced NaN curves here)."""
    rng = np.random.default_rng(3)
    pred = rng.random((12, 12))
    fix = np.zeros((12, 12))
    fix[4, 4] = 1.0
    empty = lambda S, F, n_rep, n_fix: np.empty((0, n_rep))  # noqa: E731
    assert np.isnan(M.AUC_Borji(pred, fix, rand_sampler=empty,
                                rng=np.random.default_rng(0)))
