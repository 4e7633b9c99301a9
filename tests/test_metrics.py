"""Metric parity tests: vectorized implementations vs direct transcriptions
of the reference formulas (reference utils/metrics.py), and the JAX on-device
versions vs the host versions."""

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
