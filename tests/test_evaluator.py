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


def _make_score_tree(root, n_videos=3, n_frames=4, size=24, seed=0):
    """pred/density/fixation dir trees in the reference layout
    (frame_%d.jpg densities, frame_%d.bmp fixations)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size]
    for v in range(n_videos):
        vname = f"video{v}"
        for sub in ("pred", "density", "fixation"):
            (root / sub / vname).mkdir(parents=True, exist_ok=True)
        cx, cy = rng.uniform(4, size - 4, 2)
        blob = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / 18.0)
        for i in range(1, n_frames + 1):
            noise = rng.random((size, size)) * 0.2
            cv2.imwrite(str(root / "pred" / vname / f"frame_{i}.jpg"),
                        np.uint8(np.clip(blob + noise, 0, 1) * 255))
            cv2.imwrite(str(root / "density" / vname / f"frame_{i}.jpg"),
                        np.uint8(blob * 255))
            fix = np.zeros((size, size), np.uint8)
            fys = np.clip(
                rng.normal([cy, cx], 2.0, size=(5, 2)).astype(int), 0, size - 1
            )
            fix[fys[:, 0], fys[:, 1]] = 255
            cv2.imwrite(str(root / "fixation" / vname / f"frame_{i}.bmp"), fix)


def test_evaluate_saliency_dirs_parallel_deterministic(tmp_path):
    """Same scores for any worker count and a fixed seed (the per-video
    child RNGs are drawn up-front in sorted-name order)."""
    from sap3d_tpu.eval.evaluator import evaluate_saliency_dirs

    _make_score_tree(tmp_path)
    kw = dict(
        fixation_root=str(tmp_path / "fixation"),
        metrics=("cc", "sim", "auc_judd", "auc_borji", "auc_shuffled"),
    )
    r1 = evaluate_saliency_dirs(
        str(tmp_path / "pred"), str(tmp_path / "density"),
        rng=np.random.default_rng(7), workers=1, **kw)
    r4 = evaluate_saliency_dirs(
        str(tmp_path / "pred"), str(tmp_path / "density"),
        rng=np.random.default_rng(7), workers=4, **kw)
    assert r1 == r4
    assert set(r1) == {"video0", "video1", "video2"}
    for scores in r1.values():
        assert set(scores) == {"cc", "sim", "auc_judd", "auc_borji",
                               "auc_shuffled"}
        # predictions are the (noised) ground-truth blobs: all AUCs high
        assert scores["auc_judd"] > 0.8
        assert scores["auc_borji"] > 0.7
        # shuffled AUC penalizes center-bias-like overlap with other-video
        # fixations but must remain a valid, finite score here
        assert 0.0 <= scores["auc_shuffled"] <= 1.0
        assert scores["cc"] > 0.8


def test_auc_shuffled_discriminates_on_dirs(tmp_path):
    """A prediction equal to the GT blob scores higher shuffled AUC than a
    uniform map (negatives drawn from other videos' fixations)."""
    from sap3d_tpu.eval.evaluator import evaluate_saliency_dirs

    _make_score_tree(tmp_path, seed=5)
    # overwrite video0's preds with pure noise (chance-level saliency)
    nrng = np.random.default_rng(1)
    for f in (tmp_path / "pred" / "video0").glob("*.jpg"):
        cv2.imwrite(str(f), nrng.integers(0, 256, (24, 24)).astype(np.uint8))
    r = evaluate_saliency_dirs(
        str(tmp_path / "pred"), str(tmp_path / "density"),
        fixation_root=str(tmp_path / "fixation"),
        metrics=("auc_shuffled",), rng=np.random.default_rng(0))
    assert r["video1"]["auc_shuffled"] > r["video0"]["auc_shuffled"]


def test_evaluate_saliency_dirs_device_matches_host(tmp_path):
    """The accelerator scoring path produces the same deterministic metrics
    (cc/sim/kldiv) as the host path bitwise-close, and the Monte-Carlo AUCs
    within sampling tolerance; auc_shuffled is rejected."""
    import pytest

    from sap3d_tpu.eval.evaluator import evaluate_saliency_dirs

    _make_score_tree(tmp_path)
    args = (str(tmp_path / "pred"), str(tmp_path / "density"))
    kw = dict(fixation_root=str(tmp_path / "fixation"),
              metrics=("cc", "sim", "kldiv", "nss", "auc_judd", "auc_borji",
                       "auc_shuffled"))
    host = evaluate_saliency_dirs(*args, rng=np.random.default_rng(7), **kw)
    dev = evaluate_saliency_dirs(
        *args, rng=np.random.default_rng(7), device=True, **kw)
    assert set(dev) == set(host)
    for v in host:
        assert set(dev[v]) == set(host[v])
        for m in ("cc", "sim", "kldiv", "nss"):
            assert dev[v][m] == pytest.approx(host[v][m], abs=2e-3)
        # AUCs: different PRNG streams; jitter/negative sampling noise only
        assert dev[v]["auc_judd"] == pytest.approx(host[v]["auc_judd"],
                                                   abs=0.02)
        assert dev[v]["auc_borji"] == pytest.approx(host[v]["auc_borji"],
                                                    abs=0.06)
        # device sampler draws WITH replacement (documented deviation):
        # agreement within Monte-Carlo tolerance
        assert dev[v]["auc_shuffled"] == pytest.approx(
            host[v]["auc_shuffled"], abs=0.08)


def test_device_scoring_dense_targets_and_mixed_shapes(tmp_path):
    """Device scoring must (a) host-fallback AUC on dense density-map
    targets that exceed the device sweep cap instead of reporting NaN, and
    (b) survive chunks mixing fixation targets with density fallbacks of a
    different resolution."""
    import pytest

    from sap3d_tpu.eval.evaluator import evaluate_saliency_dirs

    rng = np.random.default_rng(11)
    # one video, 4 frames at 96x96 (=9216 > 4096 active pixels possible):
    # dense density maps, fixations only for the first two frames AND at a
    # different (smaller) resolution than the density maps
    for d in ("pred/v0", "density/v0", "fixation/v0"):
        (tmp_path / d).mkdir(parents=True)
    yy, xx = np.mgrid[0:96, 0:96]
    blob = np.exp(-((yy - 48) ** 2 + (xx - 48) ** 2) / (2 * 40.0**2))
    assert (blob > 0.5).sum() > 4096  # the device cap is genuinely exceeded
    for i in range(1, 5):
        cv2.imwrite(str(tmp_path / "pred/v0" / f"frame_{i}.jpg"),
                    np.uint8(np.clip(blob + rng.normal(0, .05, blob.shape), 0, 1) * 255))
        cv2.imwrite(str(tmp_path / "density/v0" / f"frame_{i}.jpg"),
                    np.uint8(blob * 255))
        if i <= 2:
            fix = np.zeros((48, 48), np.uint8)  # NATIVE res differs
            pts = rng.integers(18, 30, size=(6, 2))
            fix[pts[:, 0], pts[:, 1]] = 255
            cv2.imwrite(str(tmp_path / "fixation/v0" / f"frame_{i}.bmp"), fix)

    host = evaluate_saliency_dirs(
        str(tmp_path / "pred"), str(tmp_path / "density"),
        str(tmp_path / "fixation"), ("cc", "auc_judd", "nss"),
        rng=np.random.default_rng(3))
    dev = evaluate_saliency_dirs(
        str(tmp_path / "pred"), str(tmp_path / "density"),
        str(tmp_path / "fixation"), ("cc", "auc_judd", "nss"),
        rng=np.random.default_rng(3), device=True)
    assert not np.isnan(dev["v0"]["auc_judd"])
    assert dev["v0"]["cc"] == pytest.approx(host["v0"]["cc"], abs=1e-3)
    assert dev["v0"]["auc_judd"] == pytest.approx(host["v0"]["auc_judd"],
                                                  abs=0.05)
    assert dev["v0"]["nss"] == pytest.approx(host["v0"]["nss"], abs=1e-2)
