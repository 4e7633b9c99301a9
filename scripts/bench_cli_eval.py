"""Time `cli eval` (the reference test.py replacement) end to end on TPU.

Round-5 verdict item 6: train, export (gen_pred) and the MATLAB-replacement
scorer all have silicon numbers; the 5-metric checkpoint-evaluator pass
(last frame @960x1080, NaN-filtered means; reference test.py:106-187) did
not.  This measures it on a synthetic validation set with the production
CLI wiring — including the clip loader in test mode, the jitted eval step,
and the host-side metric suite — and decomposes the wall time into
device-forward / data-wait / host-metric shares.

Usage: python scripts/bench_cli_eval.py [--videos 3] [--frames 60]
           [--size 320 180] [--batch 8] [--structure unet++]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import sap3d_tpu.eval.evaluator as ev_mod  # noqa: E402
from sap3d_tpu import cli  # noqa: E402
from sap3d_tpu.data.synthetic import make_synthetic_dataset  # noqa: E402
from sap3d_tpu.models.registry import build_model, resolve_name  # noqa: E402
from sap3d_tpu.train.checkpoint import CheckpointManager  # noqa: E402
from sap3d_tpu.train.state import create_train_state  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=3)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--size", type=int, nargs=2, default=(320, 180),
                    help="synthetic frame WxH; densities are scored at "
                         "960x1080 regardless (the reference protocol)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--structure", type=str, default="unet++")
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as td:
        ds = make_synthetic_dataset(
            os.path.join(td, "data"), num_videos=args.videos,
            frames_per_video=args.frames, size=tuple(args.size),
            with_fixations=True,
        )
        # a fresh-initialized flagship checkpoint: eval cost is weight-
        # independent, so no training is needed for timing
        name = resolve_name(args.structure)
        model = build_model(name, dtype="float32")
        input_shape = (args.batch, 16, 112, 112, 3)
        state = create_train_state(
            model, jax.random.PRNGKey(0), input_shape=input_shape
        )
        run_dir = os.path.join(td, "model", "bench_run")
        mgr = CheckpointManager(run_dir)
        mgr.save(state, step=0)
        mgr.wait_until_finished()
        mgr.close()
        del state

        # instrument the evaluator: time the device forward (materialized)
        # and the loader waits, leaving host metrics as the remainder.
        # The FIRST forward call carries the eval-step compile (observed
        # ~40s even with the persistent cache: the jit wrapper re-traces
        # per process) — reported separately so the steady-state device
        # share is not conflated with it.
        shares = {"forward": 0.0, "data": 0.0, "clips": 0,
                  "first_forward": None, "n_forward": 0}
        orig = ev_mod.evaluate_prediction_batches

        def instrumented(batches, forward_fn, **kw):
            def timed_batches():
                it = iter(batches)
                while True:
                    t0 = time.perf_counter()
                    try:
                        b = next(it)
                    except StopIteration:
                        return
                    shares["data"] += time.perf_counter() - t0
                    shares["clips"] += len(b[0])
                    yield b

            def timed_forward(f):
                t0 = time.perf_counter()
                out = np.asarray(forward_fn(f))
                dt = time.perf_counter() - t0
                shares["forward"] += dt
                shares["n_forward"] += 1
                if shares["first_forward"] is None:
                    shares["first_forward"] = dt
                return out

            return orig(timed_batches(), timed_forward, **kw)

        ev_mod.evaluate_prediction_batches = instrumented
        try:
            t0 = time.perf_counter()
            rc = cli.main([
                "eval", "--structure", args.structure,
                "--checkpoint", "bench_run",
                "--model-dir", os.path.join(td, "model"),
                "--frames", ds["frame_dirs"],
                "--densities", ds["density_dirs"],
                "--fixations", ds["fixation_dir"],
                "--batch", str(args.batch), "--trainingprops", "0",
            ])
            e2e = time.perf_counter() - t0
        finally:
            ev_mod.evaluate_prediction_batches = orig
        assert rc == 0, rc

        metric_t = e2e - shares["forward"] - shares["data"]
        n = shares["clips"]
        first = shares["first_forward"] or 0.0
        nf = shares["n_forward"]
        steady_fwd = ((shares["forward"] - first) / (nf - 1)) if nf > 1 else None
        # frames/s with the one-time compile excluded: the number a long
        # evaluation run converges to
        steady_fps = n / (e2e - first) if e2e > first else None
        print(json.dumps({
            "metric": "cli-eval end-to-end frames/s (5-metric protocol, "
                      "960x1080 last frame)",
            "value": round(n / e2e, 2),
            "unit": "frames/s",
            "clips_scored": n,
            "e2e_s": round(e2e, 2),
            "device_forward_share": round(shares["forward"] / e2e, 3),
            "data_wait_share": round(shares["data"] / e2e, 3),
            "host_metric_share": round(metric_t / e2e, 3),
            "first_forward_s": round(first, 2),
            "steady_forward_s_per_batch": (
                round(steady_fwd, 3) if steady_fwd is not None else None),
            "steady_frames_per_sec": (
                round(steady_fps, 2) if steady_fps is not None else None),
            "batch": args.batch,
            "structure": args.structure,
            "platform": jax.devices()[0].platform,
        }))


if __name__ == "__main__":
    main()
