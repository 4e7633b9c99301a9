"""Checkpoint evaluator: the reference test.py, TPU-native.

Protocol parity (reference test.py:79-183):

* validation-only dataset (training_props=0) with fixation maps;
* test-mode decoding: frames at 112, densities resized to (960,1080),
  fixations at native resolution (reference dataflow.py:219-240);
* per clip, take the LAST frame's prediction, resize to (960,1080);
* CC and SIM against the density map; NSS, AUC-Judd and AUC-Borji against
  the fixation map; NaN-filtered means reported (reference test.py:164-183).

This module also subsumes the reference's MATLAB batch evaluator
(reference utils/matlab_metric/eval_vid.py + metric_video_base.m): the same
per-video score matrices are produced directly by the Python/JAX metric
suite via ``evaluate_saliency_dirs`` — no MATLAB.
"""

from __future__ import annotations

import glob
import os
from typing import Callable, Iterable

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from sap3d_tpu.eval import metrics as M


def evaluate_prediction_batches(
    batches: Iterable,
    forward_fn: Callable[[np.ndarray], np.ndarray],
    out_size: tuple[int, int] = (960, 1080),
    log_every: int = 100,
    rng: np.random.Generator | None = None,
) -> dict:
    """Run the model over (frames, densities, fixations) batches and score.

    forward_fn: [B,T,H,W,3] float32 -> [B,T,H,W] saliency.
    """
    rng = rng or np.random.default_rng(0)
    cc, sim, nss, auc_judd, auc_borji = [], [], [], [], []
    index = 0
    for frames, densities, fixations in batches:
        index += 1
        pred = np.asarray(forward_fn(frames))
        for b in range(pred.shape[0]):
            p = cv2.resize(pred[b, -1], dsize=out_size)
            density = densities[b, -1]
            fixation = fixations[b, -1]
            cc.append(M.CC(p, density))
            sim.append(M.SIM(p, density))
            nss.append(M.NSS(p, fixation))
            auc_judd.append(M.AUC_Judd(p, fixation, rng=rng))
            auc_borji.append(M.AUC_Borji(p, fixation, rng=rng))
        if log_every and index % log_every == 0:
            print(
                f" Step: {index}, Metrics: CC: {M.nan_filtered_mean(cc):.3f}  "
                f"SIM: {M.nan_filtered_mean(sim):.3f}   "
                f"NSS: {M.nan_filtered_mean(nss):.3f}  "
                f"AUC_Judd: {M.nan_filtered_mean(auc_judd):.3f}   "
                f"AUC_Borji: {M.nan_filtered_mean(auc_borji):.3f}"
            )
    return {
        "n": len(cc),
        "cc": M.nan_filtered_mean(cc),
        "sim": M.nan_filtered_mean(sim),
        "nss": M.nan_filtered_mean(nss),
        "auc_judd": M.nan_filtered_mean(auc_judd),
        "auc_borji": M.nan_filtered_mean(auc_borji),
    }


def evaluate_saliency_dirs(
    pred_root: str,
    density_root: str,
    fixation_root: str | None = None,
    metrics: tuple[str, ...] = ("cc", "sim", "auc_judd"),
    rng: np.random.Generator | None = None,
) -> dict[str, dict[str, float]]:
    """Score exported saliency maps against ground truth, per video.

    Replacement for the MATLAB batch path (reference
    utils/matlab_metric/metric_video_base.m computes CC/SIM/AUC-Judd per frame
    with parfor; here it's a NumPy loop per video with the same formulas).
    Returns {video: {metric: mean score}}.
    """
    rng = rng or np.random.default_rng(0)
    results: dict[str, dict[str, float]] = {}
    for vdir in sorted(glob.glob(os.path.join(pred_root, "*"))):
        if not os.path.isdir(vdir):
            continue
        vname = os.path.basename(vdir)
        scores: dict[str, list] = {m: [] for m in metrics}
        for pf in sorted(
            glob.glob(os.path.join(vdir, "*.jpg")),
            key=lambda p: int(os.path.basename(p).split("_")[-1].split(".")[0]),
        ):
            fname = os.path.basename(pf)
            gt_path = os.path.join(density_root, vname, fname)
            if not os.path.exists(gt_path):
                continue
            pred = cv2.imread(pf, cv2.IMREAD_GRAYSCALE).astype(np.float64) / 255.0
            gt = cv2.imread(gt_path, cv2.IMREAD_GRAYSCALE).astype(np.float64) / 255.0
            fix = None
            if fixation_root:
                fix_path = os.path.join(
                    fixation_root, vname, fname.rsplit(".", 1)[0] + ".bmp"
                )
                if os.path.exists(fix_path):
                    fix = (
                        cv2.imread(fix_path, cv2.IMREAD_GRAYSCALE).astype(np.float64)
                        / 255.0
                    )
            for m in metrics:
                if m == "cc":
                    scores[m].append(M.CC(pred, gt))
                elif m == "sim":
                    scores[m].append(M.SIM(pred, gt))
                elif m == "kldiv":
                    scores[m].append(M.KLdiv(pred, gt))
                elif m == "nss" and fix is not None:
                    scores[m].append(M.NSS(pred, fix))
                elif m == "auc_judd":
                    target = fix if fix is not None else gt
                    scores[m].append(M.AUC_Judd(pred, target, rng=rng))
                elif m == "auc_borji" and fix is not None:
                    scores[m].append(M.AUC_Borji(pred, fix, rng=rng))
        results[vname] = {m: M.nan_filtered_mean(v) for m, v in scores.items() if v}
    return results
