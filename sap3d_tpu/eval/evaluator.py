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
            # bilinear pre-resize to (960,1080) is reference-exact: the
            # reference resizes the prediction with cv2's default BEFORE
            # scoring (reference test.py:168); the metrics' own bicubic
            # resize then only applies to any remaining mismatch (fixation
            # maps at native resolution)
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


def _read_gray(path: str) -> np.ndarray:
    # imread_checked names the offending file on decode failure (cv2's
    # silent None would surface as a pathless AttributeError from a worker)
    from sap3d_tpu.data.pipeline import imread_checked

    return imread_checked(path, cv2.IMREAD_GRAYSCALE).astype(np.float64) / 255.0


def _video_frame_pairs(
    vdir: str, vname: str, density_root: str, fixation_root: str | None
) -> list[tuple[str, str, str | None]]:
    """Sorted (pred, density, fixation|None) path triples for one video."""
    out = []
    for pf in sorted(
        glob.glob(os.path.join(vdir, "*.jpg")),
        key=lambda p: int(os.path.basename(p).split("_")[-1].split(".")[0]),
    ):
        fname = os.path.basename(pf)
        gt_path = os.path.join(density_root, vname, fname)
        if not os.path.exists(gt_path):
            continue
        fix_path = None
        if fixation_root:
            cand = os.path.join(
                fixation_root, vname, fname.rsplit(".", 1)[0] + ".bmp"
            )
            if os.path.exists(cand):
                fix_path = cand
        out.append((pf, gt_path, fix_path))
    return out


def _fixation_union(
    pairs: list[tuple[str, str, str | None]], max_frames: int = 20
) -> np.ndarray | None:
    """OR of up to max_frames EVENLY-STRIDED fixation maps of a video
    (native resolution); the negative-sample pool for shuffled AUC
    (reference metrics.py:157-197 draws negatives from fixations on OTHER
    images).  Documented deviation (PARITY.md §2.7): the reference pools
    every frame; the strided union differs by <2e-4 shuffled-AUC on the
    synthetic fixture because the union saturates after a few frames."""
    fix_paths = [fp for _, _, fp in pairs if fp is not None]
    if not fix_paths:
        return None
    stride = max(1, len(fix_paths) // max_frames)
    union = None
    for fp in fix_paths[::stride][:max_frames]:
        m = _read_gray(fp) > 0.5
        union = m if union is None else (union | m)
    return union


def _score_video(
    pairs: list[tuple[str, str, str | None]],
    metrics: tuple[str, ...],
    rng: np.random.Generator,
    other_union: np.ndarray | None,
) -> dict[str, float]:
    scores: dict[str, list] = {m: [] for m in metrics}
    other_resized: dict[tuple[int, int], np.ndarray] = {}
    for pf, gt_path, fix_path in pairs:
        pred = _read_gray(pf)
        gt = _read_gray(gt_path)
        fix = _read_gray(fix_path) if fix_path else None
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
            elif m == "auc_shuffled" and fix is not None and other_union is not None:
                shape = fix.shape
                if shape not in other_resized:
                    other_resized[shape] = (
                        cv2.resize(
                            other_union.astype(np.uint8),
                            (shape[1], shape[0]),
                            interpolation=cv2.INTER_NEAREST,
                        )
                        > 0
                    )
                scores[m].append(
                    M.AUC_shuffled(pred, fix, other_resized[shape], rng=rng)
                )
    return {m: M.nan_filtered_mean(v) for m, v in scores.items() if v}


def _score_video_device(
    pairs: list[tuple[str, str, str | None]],
    metrics: tuple[str, ...],
    rng: np.random.Generator,
    other_union: np.ndarray | None = None,
    batch: int = 32,
    stats: dict[str, int] | None = None,
) -> dict[str, float]:
    """One video's scores with the metric math on the accelerator.

    Decoding and resize stay host-side; frames are stacked into [batch,H,W]
    chunks and each requested metric runs as ONE jitted reduction per chunk
    (eval/metrics_jax.py), replacing the per-frame NumPy loops.  AUC-Judd
    jitter and the Borji/shuffled samplers use a JAX PRNG derived from
    ``rng``, so scores match the host path in distribution (both are
    Monte-Carlo); cc/sim/kldiv are deterministic and match the host
    bitwise-close.  ``other_union`` is the cross-video fixation pool for
    ``auc_shuffled`` (its flat indices become the device sampler's pool).
    """
    import jax
    import jax.numpy as jnp

    from sap3d_tpu.eval import metrics_jax as MJ

    key = jax.random.PRNGKey(int(rng.integers(0, 2**31)))
    scores: dict[str, list] = {m: [] for m in metrics}
    if stats is None:
        stats = {}
    for k in ("judd_frames", "judd_dense_device",
              "borji_frames", "borji_host_fallback"):
        stats.setdefault(k, 0)
    want_fix = {"nss", "auc_judd", "auc_borji", "auc_shuffled"} & set(metrics)
    other_cache: dict[tuple, tuple[np.ndarray, int]] = {}

    def other_pool(shape):
        # cross-video fixation indices at this target shape, zero-padded to
        # a power of two so jit recompiles stay bounded
        if shape not in other_cache:
            u = cv2.resize(
                other_union.astype(np.uint8), (shape[1], shape[0]),
                interpolation=cv2.INTER_NEAREST,
            ) > 0
            idx = np.flatnonzero(u)
            m = len(idx)
            pad = max(1 << max(m - 1, 1).bit_length(), 1)
            other_cache[shape] = (
                np.pad(idx, (0, pad - m)).astype(np.int32), m,
            )
        return other_cache[shape]

    def resize_stack(preds, tgts, interpolation):
        # host-parity interpolation per metric (metrics.py:_resize_to:
        # reference order=3 cubic for CC/SIM/KL/AUC, order=1 linear for NSS)
        return np.stack([
            cv2.resize(p, (t.shape[1], t.shape[0]),
                       interpolation=interpolation)
            if p.shape != t.shape else p
            for p, t in zip(preds, tgts)
        ]).astype(np.float32)

    for i in range(0, len(pairs), batch):
        chunk = pairs[i:i + batch]
        preds = [_read_gray(pf) for pf, _, _ in chunk]
        gts = [_read_gray(gp) for _, gp, _ in chunk]
        if {"cc", "sim", "kldiv"} & set(metrics):
            pred_at_gt = resize_stack(preds, gts, cv2.INTER_CUBIC)
            gt_arr = np.stack(gts).astype(np.float32)
            if "cc" in metrics:
                scores["cc"] += list(np.asarray(MJ.cc(pred_at_gt, gt_arr)))
            if "sim" in metrics:
                scores["sim"] += list(np.asarray(MJ.sim(pred_at_gt, gt_arr)))
            if "kldiv" in metrics:
                scores["kldiv"] += list(np.asarray(MJ.kldiv(
                    np.clip(pred_at_gt, 0.0, None), gt_arr)))
        if want_fix:
            # fixation maps are native-resolution; pred resized to match.
            # auc_judd falls back to the density map when no fixation exists
            # (host parity, _score_video).  Frames are bucketed by target
            # shape (fixation vs density fallback may differ within a chunk).
            fixes = [
                _read_gray(fp) if fp else None for _, _, fp in chunk
            ]
            tgts = [f if f is not None else g for f, g in zip(fixes, gts)]
            buckets: dict[tuple, list[int]] = {}
            for j, t in enumerate(tgts):
                buckets.setdefault(t.shape, []).append(j)
            for idxs in buckets.values():
                tgt_b = [tgts[j] for j in idxs]
                tgt_arr = np.stack(tgt_b).astype(np.float32)
                has_fix = np.array([fixes[j] is not None for j in idxs])
                key, k1, k2, k3 = jax.random.split(key, 4)
                if ("auc_shuffled" in metrics and other_union is not None
                        and has_fix.any()):
                    pool_idx, pool_n = other_pool(tgt_arr[0].shape)
                    pred_cub = resize_stack(
                        [preds[j] for j in idxs], tgt_b, cv2.INTER_CUBIC)
                    v = np.asarray(MJ.auc_shuffled(
                        pred_cub, tgt_arr, jnp.asarray(pool_idx),
                        jnp.int32(pool_n), k3))
                    scores["auc_shuffled"] += [
                        float(v[b]) for b in range(len(idxs)) if has_fix[b]
                    ]
                if {"auc_judd", "auc_borji"} & set(metrics):
                    pred_cubic = resize_stack(
                        [preds[j] for j in idxs], tgt_b, cv2.INTER_CUBIC)
                    # frames whose active-pixel count exceeds the default
                    # device sweep cap (dense density-map targets on the
                    # auc_judd fallback path) are re-swept ON DEVICE with a
                    # raised, pow2-padded cap — not silently on host
                    active = (tgt_arr > 0.5).sum(axis=(1, 2))
                    over = active > min(4096, tgt_arr[0].size)
                    if "auc_judd" in metrics:
                        stats["judd_frames"] += len(idxs)
                        v = np.asarray(MJ.auc_judd(pred_cubic, tgt_arr, k1))
                        out = [float(x) for x in v]
                        over_idx = np.flatnonzero(over)
                        if over_idx.size:
                            # pow2 cap bounds jit recompiles; chunk so the
                            # [N, cap] sweep arrays stay <= ~32MB
                            m = int(active[over_idx].max())
                            dense_cap = min(
                                1 << max(m - 1, 1).bit_length(),
                                int(tgt_arr[0].size),
                            )
                            step = max(1, (1 << 23) // dense_cap)
                            for c0 in range(0, over_idx.size, step):
                                sel = over_idx[c0:c0 + step]
                                key, kd = jax.random.split(key)
                                vd = np.asarray(MJ.auc_judd(
                                    pred_cubic[sel], tgt_arr[sel], kd,
                                    fix_cap=dense_cap))
                                for b, x in zip(sel, vd):
                                    out[b] = float(x)
                            stats["judd_dense_device"] += int(over_idx.size)
                        scores["auc_judd"] += out
                    if "auc_borji" in metrics:
                        # real fixation maps are sparse, so over-cap Borji
                        # frames are rare; the sampled-negative sweep's
                        # [N, R, cap] memory makes a raised device cap
                        # uneconomical — fall back to host, but COUNT it
                        stats["borji_frames"] += int(has_fix.sum())
                        stats["borji_host_fallback"] += int(
                            (over & has_fix).sum())
                        v = np.asarray(MJ.auc_borji(pred_cubic, tgt_arr, k2))
                        scores["auc_borji"] += [
                            (M.AUC_Borji(pred_cubic[b], tgt_arr[b], rng=rng)
                             if over[b] else float(v[b]))
                            for b in range(len(idxs)) if has_fix[b]
                        ]
                if "nss" in metrics and has_fix.any():
                    pred_lin = resize_stack(
                        [preds[j] for j in idxs], tgt_b, cv2.INTER_LINEAR)
                    v = np.asarray(MJ.nss(pred_lin, tgt_arr))
                    scores["nss"] += [
                        float(v[b]) for b in range(len(idxs)) if has_fix[b]
                    ]
    return {m: M.nan_filtered_mean(v) for m, v in scores.items() if v}


def evaluate_saliency_dirs(
    pred_root: str,
    density_root: str,
    fixation_root: str | None = None,
    metrics: tuple[str, ...] = ("cc", "sim", "auc_judd"),
    rng: np.random.Generator | None = None,
    workers: int | None = None,
    device: bool = False,
) -> dict[str, dict[str, float]]:
    """Score exported saliency maps against ground truth, per video.

    Replacement for the MATLAB batch path (reference
    utils/matlab_metric/metric_video_base.m computes CC/SIM/AUC-Judd per frame
    with ``parpool(5)``/parfor; here videos are scored concurrently on a
    thread pool — cv2 decode and the large-map NumPy ops release the GIL —
    with the same formulas).  ``auc_shuffled`` draws its negative samples
    from the union of OTHER videos' fixation maps (the reference's shuffled
    sampler semantics, reference utils/metrics.py:157-197) and requires
    ``fixation_root``.  Returns {video: {metric: mean score}}; deterministic
    for a fixed rng seed regardless of worker count (per-video child seeds
    are drawn up-front in sorted-name order).

    ``device=True`` runs the metric math batched on the accelerator
    (``_score_video_device``): frames are scored in one jitted reduction per
    chunk instead of per-frame NumPy loops.  Videos are then processed
    serially (one device, no thread pool).
    """
    rng = rng or np.random.default_rng(0)
    vdirs = [
        d for d in sorted(glob.glob(os.path.join(pred_root, "*")))
        if os.path.isdir(d)
    ]
    vnames = [os.path.basename(d) for d in vdirs]
    all_pairs = [
        _video_frame_pairs(d, v, density_root, fixation_root)
        for d, v in zip(vdirs, vnames)
    ]

    others: list[np.ndarray | None] = [None] * len(vdirs)
    if "auc_shuffled" in metrics and fixation_root:
        unions = [_fixation_union(p) for p in all_pairs]
        for i in range(len(vdirs)):
            pool = [u for j, u in enumerate(unions) if j != i and u is not None]
            if pool:
                # OR the other videos' unions at the largest native shape
                shape = max((u.shape for u in pool), key=lambda s: s[0] * s[1])
                acc = np.zeros(shape, bool)
                for u in pool:
                    if u.shape != shape:
                        u = cv2.resize(
                            u.astype(np.uint8), (shape[1], shape[0]),
                            interpolation=cv2.INTER_NEAREST,
                        ) > 0
                    acc |= u
                others[i] = acc

    # deterministic per-video streams regardless of completion order
    child_rngs = [np.random.default_rng(s) for s in rng.spawn(len(vdirs))] \
        if vdirs else []
    if device:
        stats: dict[str, int] = {}
        result = {
            v: _score_video_device(pairs, metrics, crng, other, stats=stats)
            for v, pairs, crng, other in zip(
                vnames, all_pairs, child_rngs, others)
        }
        if stats.get("judd_dense_device") or stats.get("borji_host_fallback"):
            print(
                "[eval-dirs --device] dense targets: "
                f"{stats['judd_dense_device']}/{stats['judd_frames']} "
                "AUC-Judd frames re-swept on device with a raised cap; "
                f"{stats['borji_host_fallback']}/{stats['borji_frames']} "
                "AUC-Borji frames used the host sweep"
            )
        return result
    if workers is None:
        workers = min(8, os.cpu_count() or 1)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(workers, thread_name_prefix="eval") as pool:
        futs = [
            pool.submit(_score_video, pairs, metrics, crng, other)
            for pairs, crng, other in zip(all_pairs, child_rngs, others)
        ]
        return {v: f.result() for v, f in zip(vnames, futs)}
