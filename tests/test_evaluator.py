"""Tests for the checkpoint evaluator (reference test.py protocol)."""

import numpy as np
import pytest

from sap3d_tpu.eval.evaluator import evaluate_prediction_batches

cv2 = pytest.importorskip("cv2")


def _batches(n=3, b=2, t=16, size=8, gt=32, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        frames = rng.normal(size=(b, t, size, size, 3)).astype(np.float32)
        densities = rng.random((b, t, gt, gt)).astype(np.float32)
        fixations = (rng.random((b, t, gt, gt)) < 0.05).astype(np.float32)
        fixations[:, :, 0, 0] = 1.0  # never empty
        yield frames, densities, fixations


def test_evaluate_prediction_batches_protocol():
    """Last frame per clip, pred resized to out_size, 5 NaN-filtered means
    (reference test.py:164-183)."""
    calls = []

    def forward(frames):
        calls.append(frames.shape)
        # deterministic pseudo-prediction derived from the input
        return np.abs(frames[..., 0])

    result = evaluate_prediction_batches(
        _batches(), forward, out_size=(32, 32), log_every=0
    )
    assert calls and all(c == (2, 16, 8, 8, 3) for c in calls)
    assert result["n"] == 6  # 3 batches x 2 clips
    for key in ("cc", "sim", "nss", "auc_judd", "auc_borji"):
        assert np.isfinite(result[key]), key
    assert 0.0 <= result["auc_judd"] <= 1.0
    assert 0.0 <= result["auc_borji"] <= 1.0


def test_evaluate_prediction_oracle_prediction():
    """A forward that returns (an upscalable version of) the density map
    itself should score high CC.  Densities are smooth blobs so the 32->8->32
    resize round trip preserves them (white noise would not survive it)."""

    batches = []
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:32, 0:32]
    for f, _, fix in _batches(n=2, seed=3):
        cx, cy = rng.uniform(8, 24, 2)
        blob = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 25.0))
        d = np.broadcast_to(blob, (f.shape[0], 16, 32, 32)).astype(np.float32)
        batches.append((f, d.copy(), fix))

    def oracle_forward(frames):
        # look up the matching batch and downscale its density to pred size
        for f, d, _ in batches:
            if f.shape == frames.shape and np.allclose(f, frames):
                out = np.stack([
                    np.stack([cv2.resize(d[b, t], (8, 8)) for t in range(16)])
                    for b in range(d.shape[0])
                ])
                return out
        raise AssertionError("batch not found")

    result = evaluate_prediction_batches(
        iter(batches), oracle_forward, out_size=(32, 32), log_every=0
    )
    assert result["cc"] > 0.5  # downscale+upscale keeps strong correlation
