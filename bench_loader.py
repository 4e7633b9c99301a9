#!/usr/bin/env python
"""Host input-pipeline throughput bench (reference TestDataSpeed parity,
dataflow.py:258 — present there but commented out).

Builds a synthetic frame tree, then measures ClipLoader clips/sec with and
without the decoded-frame cache at reference-like settings (overlap 15,
batch 2 -> heavy frame reuse).
"""

import json
import shutil
import tempfile
import time

from sap3d_tpu.data.indexer import ClipIndex
from sap3d_tpu.data.pipeline import ClipLoader
from sap3d_tpu.data.synthetic import make_synthetic_dataset


def main():
    root = tempfile.mkdtemp(prefix="sap3d_loaderbench_")
    try:
        roots = make_synthetic_dataset(
            root, num_videos=6, frames_per_video=120, size=(640, 360)
        )
        idx = ClipIndex([roots["frame_dirs"]], [roots["density_dirs"]]).setup(
            overlap=15, training_props=1.0
        )
        clips = idx.train_clips()

        results = {}
        for cache in (0, 16384):
            loader = ClipLoader(
                clips, batch_size=2, size=112, num_threads=16,
                cache_frames=cache,
            )
            n = 0
            t0 = time.perf_counter()
            for frames, _ in loader:
                n += frames.shape[0]
            dt = time.perf_counter() - t0
            key = "cached" if cache else "uncached"
            results[f"{key}_clips_per_sec"] = round(n / dt, 1)
            if cache:
                results["cache_hit_rate"] = round(
                    loader.cache.hits / (loader.cache.hits + loader.cache.misses), 3
                )
        results["n_clips"] = len(clips)
        print(json.dumps(results))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
