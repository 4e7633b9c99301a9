"""Benchmark batch saliency scoring (the MATLAB-evaluator replacement).

The reference scores exported saliency dirs with MATLAB `parpool(5)` +
parfor over frames (reference utils/matlab_metric/metric_video_base.m:1-20),
computing CC/SIM/AUC-Judd per frame via the MIT benchmark toolbox.  This
script measures the rebuild's `evaluate_saliency_dirs` in frames/s on a
synthetic tree at a realistic evaluation resolution, for 1 and N workers.

Usage: python scripts/bench_eval.py [--videos 6] [--frames 50] [--size 480 640]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

import cv2

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # The axon sitecustomize re-registers the TPU backend; the env var alone
    # does not force CPU (see .claude/skills/verify/SKILL.md).
    import jax

    jax.config.update("jax_platforms", "cpu")

from sap3d_tpu.eval.evaluator import evaluate_saliency_dirs


def make_tree(root: Path, n_videos: int, n_frames: int, size: tuple[int, int]):
    h, w = size
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    for v in range(n_videos):
        vname = f"video{v:03d}"
        for sub in ("pred", "density", "fixation"):
            (root / sub / vname).mkdir(parents=True, exist_ok=True)
        cx, cy = rng.uniform(0.2, 0.8, 2) * (w, h)
        blob = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * (0.08 * w) ** 2))
        for i in range(1, n_frames + 1):
            noise = rng.random((h, w)) * 0.15
            cv2.imwrite(str(root / "pred" / vname / f"frame_{i}.jpg"),
                        np.uint8(np.clip(blob + noise, 0, 1) * 255))
            cv2.imwrite(str(root / "density" / vname / f"frame_{i}.jpg"),
                        np.uint8(blob * 255))
            fix = np.zeros((h, w), np.uint8)
            pts = rng.normal([cy, cx], 0.04 * w, size=(8, 2)).astype(int)
            pts = np.clip(pts, 0, [h - 1, w - 1])
            fix[pts[:, 0], pts[:, 1]] = 255
            cv2.imwrite(str(root / "fixation" / vname / f"frame_{i}.bmp"), fix)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=6)
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--size", type=int, nargs=2, default=(480, 640))
    ap.add_argument("--metrics", type=str, nargs="*",
                    default=["cc", "sim", "auc_judd"],
                    help="default = the MATLAB evaluator's active set "
                         "(metric_video_base.m:11-16 masks the others)")
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        make_tree(root, args.videos, args.frames, tuple(args.size))
        n_total = args.videos * args.frames
        for label, kw in (
            ("workers=1", dict(workers=1)),
            ("workers=auto", dict(workers=None)),
            ("device (warmup)", dict(device=True)),
            ("device", dict(device=True)),
        ):
            t0 = time.perf_counter()
            res = evaluate_saliency_dirs(
                str(root / "pred"), str(root / "density"),
                str(root / "fixation"), tuple(args.metrics),
                rng=np.random.default_rng(0), **kw,
            )
            dt = time.perf_counter() - t0
            print(f"{label}: {n_total} frames in {dt:.2f}s = "
                  f"{n_total / dt:.1f} frames/s  "
                  f"(mean cc {np.nanmean([r['cc'] for r in res.values()]):.3f})",
                  flush=True)

        # dense-target path: no fixation root -> auc_judd falls back to the
        # density map itself, whose active-pixel count exceeds the default
        # sweep cap — exercises the raised-cap device re-sweep
        # (eval/evaluator.py:_score_video_device) vs the host loop
        if "auc_judd" in args.metrics:
            for label, kw in (("dense-gt host workers=auto", dict()),
                              ("dense-gt device (warmup)", dict(device=True)),
                              ("dense-gt device", dict(device=True))):
                t0 = time.perf_counter()
                res = evaluate_saliency_dirs(
                    str(root / "pred"), str(root / "density"), None,
                    tuple(args.metrics), rng=np.random.default_rng(0), **kw,
                )
                dt = time.perf_counter() - t0
                print(f"{label}: {n_total} frames in {dt:.2f}s = "
                      f"{n_total / dt:.1f} frames/s  (mean auc "
                      f"{np.nanmean([r['auc_judd'] for r in res.values()]):.3f})",
                      flush=True)


if __name__ == "__main__":
    main()
