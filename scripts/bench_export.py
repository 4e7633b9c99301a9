"""End-to-end export-path bench: decode -> sliding window -> device -> JPEG.

Times SlidingWindowPredictor.export_dataset on a synthetic dataset
(gen_pred workload, reference gen_pred.py:73-168): full host decode, the
stride-1 window protocol, batched device forward, 960x1080 JPEG export.
Reports frames/s end to end (each emitted frame ~ one 16-frame window at
stride 1, so frames/s ~= window-clips/s).
"""

import os
import shutil
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sap3d_tpu.data.synthetic import make_synthetic_dataset
from sap3d_tpu.infer.predictor import SlidingWindowPredictor
from sap3d_tpu.models.registry import build_model
from sap3d_tpu.train.state import create_train_state
from sap3d_tpu.train.steps import make_eval_step

ROOT = "/tmp/bench_export"


def main():
    n_videos = int(os.environ.get("BENCH_EXPORT_VIDEOS", "4"))
    frames_per_video = int(os.environ.get("BENCH_EXPORT_FRAMES", "200"))
    shutil.rmtree(ROOT, ignore_errors=True)
    ds = make_synthetic_dataset(
        os.path.join(ROOT, "data"), num_videos=n_videos,
        frames_per_video=frames_per_video, size=(640, 360),
    )

    model = build_model("p3d_unetplusplus_ds", dtype="bfloat16")
    state = create_train_state(
        model, jax.random.PRNGKey(0), input_shape=(16, 16, 112, 112, 3)
    )
    ev = make_eval_step(model)
    pred = SlidingWindowPredictor(lambda clips: ev(state, clips))

    # warmup run compiles + fills caches, second run is the measurement
    pred.export_dataset(ds["frame_dirs"], os.path.join(ROOT, "warm"))
    shutil.rmtree(os.path.join(ROOT, "warm"), ignore_errors=True)
    t0 = time.perf_counter()
    n = pred.export_dataset(ds["frame_dirs"], os.path.join(ROOT, "out"))
    dt = time.perf_counter() - t0
    total_frames = n_videos * frames_per_video
    print(f"exported {n} videos, {total_frames} frames in {dt:.1f}s = "
          f"{total_frames / dt:.1f} frames/s end-to-end "
          f"(decode + windows + device + 960x1080 JPEG write)")


if __name__ == "__main__":
    main()
