"""Sliding-window per-frame saliency inference and export.

Protocol parity with reference gen_pred.py:73-168:

* videos processed in sorted order; a video whose output dir already exists
  is skipped (making reruns resumable, reference gen_pred.py:83-86);
* a 16-frame window slides with stride 1 over each video;
* the FIRST window emits all 16 frames; every later window emits only its
  last frame (reference gen_pred.py:154-168);
* emitted maps are scaled x255, resized to (960, 1080), and written as
  ``frame_%d.jpg``;
* frame preprocessing matches the training pipeline: RGB flip, mean-subtract,
  resize 112, /255 (reference gen_pred.py:117-122).

TPU-native redesign: instead of one clip per device step behind a host-side
ring buffer (the reference decodes one new frame then runs sess.run per
window), each frame is decoded ONCE on host, the whole preprocessed video is
uploaded to HBM once, and windows are gathered on device with a vmapped
dynamic-slice and processed in batches — turning ~16x redundant host decode +
transfer into a single pass and keeping the MXU fed with batched clips.
"""

from __future__ import annotations

import os
import shutil
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from sap3d_tpu.data.pipeline import imread_checked, preprocess_frame


def _numeric_frame_sort(paths: Sequence[str]) -> list[str]:
    """Sort frame paths by their numeric index (reference gen_pred.py:88)."""
    return sorted(paths, key=lambda p: int(os.path.basename(p).split("_")[-1].split(".")[0]))


class SlidingWindowPredictor:
    def __init__(
        self,
        apply_fn: Callable[[jax.Array], jax.Array],
        window: int = 16,
        batch_windows: int = 16,
        image_size: int = 112,
        out_size: tuple[int, int] = (960, 1080),
        num_threads: int = 16,
    ):
        """apply_fn: jitted [W, T, H, W, 3] -> [W, T, H, W] saliency.

        batch_windows defaults to 16: the measured inference saturation knee
        on v5e (BASELINE.md batch sweep: 16 -> 539.6, 32 -> 547.9 clips/s).
        Decoding uses a ``num_threads`` pool (cv2 releases the GIL), matching
        the training pipeline's parallel decode."""
        self.apply_fn = apply_fn
        self.window = window
        self.batch_windows = batch_windows
        self.image_size = image_size
        self.out_size = out_size
        self._pool = ThreadPoolExecutor(num_threads, thread_name_prefix="pred-decode")
        # separate pool for the 960x1080 JPEG encode/write so write-behind
        # doesn't starve the decode of the NEXT video
        self._write_pool = ThreadPoolExecutor(
            num_threads // 2 or 1, thread_name_prefix="pred-write"
        )
        # write-behind bookkeeping: (futures, tmp_dir, final_dir) per video;
        # a video's dir only appears under its final name once every JPEG
        # has been flushed, so skip_existing on a rerun never skips a
        # partially-written video (crash mid-run leaves only *.tmp-partial)
        self._pending_videos: list[tuple[list, str, str]] = []

        # Gathering is jitted separately from the model call: apply_fn is
        # typically a jitted closure over the train state, and nesting it
        # under another jit would inline the parameters as compile-time
        # constants (hundreds of MB of HLO literals for the 85M-param model).
        @jax.jit
        def gather(frames_dev: jax.Array, starts: jax.Array) -> jax.Array:
            def one(s):
                return jax.lax.dynamic_slice_in_dim(frames_dev, s, self.window, 0)

            return jax.vmap(one)(starts)  # [W, T, H, W, 3]

        # The emission protocol needs only the LAST frame of every window
        # (plus window 0 in full, reference gen_pred.py:154-168), so slice on
        # device: pulling whole [W, T, H, W] outputs to host costs 16x the
        # bytes, and host<->device transfer is the export path's bottleneck
        # on tunneled runtimes (measured 6s/video of pure D2H, BASELINE.md).
        @jax.jit
        def last_frames(out: jax.Array) -> jax.Array:
            return out[:, -1]  # [W, H, W]

        self._gather_and_run = lambda frames_dev, starts: self.apply_fn(
            gather(frames_dev, starts)
        )
        self._gather_and_run_last = lambda frames_dev, starts: last_frames(
            self.apply_fn(gather(frames_dev, starts))
        )

    def decode_video(self, frame_paths: Sequence[str]) -> np.ndarray:
        """Decode+preprocess a whole video with the thread pool -> [N,H,W,3].

        Each frame is decoded ONCE (vs ~16x in the reference's per-window
        ring buffer, reference gen_pred.py:110-134)."""
        paths = _numeric_frame_sort(list(frame_paths))
        if len(paths) < self.window:
            return np.zeros(
                (0, self.image_size, self.image_size, 3), np.float32
            )

        def one(p):
            return preprocess_frame(imread_checked(p, cv2.IMREAD_COLOR), self.image_size)

        return np.stack(list(self._pool.map(one, paths))).astype(np.float32)

    def prepare_video(self, frame_paths: Sequence[str]) -> jax.Array | np.ndarray:
        """Decode + upload a whole video to HBM (for the lookahead thread:
        both the cv2 decode and the H2D transfer overlap the previous
        video's inference)."""
        frames = self.decode_video(frame_paths)
        return jax.device_put(frames) if frames.shape[0] else frames

    def predict_video(
        self,
        frame_paths: Sequence[str] | None = None,
        frames: np.ndarray | None = None,
    ) -> np.ndarray:
        """All sliding-window outputs for one video.

        Accepts frame paths (decoded here) or an already-decoded [N,H,W,3]
        array (the overlapped export path decodes video N+1 while the device
        works on video N).  Returns the per-frame saliency maps under the
        reference emission protocol: index i holds the map emitted for
        (1-based) frame i+1.  Videos shorter than one window return an empty
        array.
        """
        if frames is None:
            frames = self.decode_video(list(frame_paths))
        n = frames.shape[0]
        if n < self.window:
            return np.zeros((0, self.image_size, self.image_size), np.float32)
        # accepts an already-device-resident array (prepare_video uploads
        # from the lookahead thread so H2D overlaps the previous video)
        frames_dev = (
            frames if isinstance(frames, jax.Array) else jax.device_put(frames)
        )

        n_windows = n - self.window + 1
        emitted = np.zeros((n, self.image_size, self.image_size), np.float32)
        # Dispatch every window batch asynchronously and materialize once at
        # the end: per-batch host syncs and full-window transfers are the
        # dominant export-path terms on remote runtimes.  Only the FIRST
        # batch pulls full [W, T, H, W] outputs (window 0 emits all 16
        # frames); every other batch transfers last frames only.
        pending: list[tuple[np.ndarray, jax.Array, bool]] = []
        for base in range(0, n_windows, self.batch_windows):
            starts = np.arange(
                base, min(base + self.batch_windows, n_windows), dtype=np.int32
            )
            pad = self.batch_windows - len(starts)
            starts_p = np.concatenate([starts, np.full(pad, starts[-1], np.int32)])
            full = base == 0
            run = self._gather_and_run if full else self._gather_and_run_last
            pending.append((starts, run(frames_dev, jnp.asarray(starts_p)), full))
        for starts, dev_out, full in pending:
            out = np.asarray(dev_out)[: len(starts)]
            for j, s in enumerate(starts):
                if s == 0:
                    emitted[0 : self.window] = out[j]  # first window: all 16
                elif full:
                    emitted[s + self.window - 1] = out[j, -1]
                else:
                    emitted[s + self.window - 1] = out[j]  # last frame only
        return emitted

    @staticmethod
    def _video_paths(frame_dir: str) -> list[str]:
        return [
            os.path.join(frame_dir, f)
            for f in os.listdir(frame_dir)
            if f.endswith(".jpg")
        ]

    def export_video(
        self,
        frame_dir: str,
        save_dir: str,
        skip_existing: bool = True,
        frames: np.ndarray | None = None,
        wait: bool = True,
    ) -> bool:
        """Predict one video directory and write frame_%d.jpg maps.

        Returns False if skipped (output dir already exists).  The 960x1080
        resize + JPEG encode runs on a thread pool (cv2 releases the GIL);
        with ``wait=False`` the writes trail in the background (call
        :meth:`flush_writes` before relying on the files) so the next
        video's decode/inference overlaps them.

        Crash safety: frames are written into ``<save_dir>.tmp-partial`` and
        the directory is renamed to ``save_dir`` only after every write has
        completed, so a crash mid-run never leaves a final-named dir with
        missing frames for skip_existing to silently skip.
        """
        if os.path.exists(save_dir) and skip_existing:
            return False
        maps = self.predict_video(self._video_paths(frame_dir), frames=frames)
        tmp_dir = save_dir + ".tmp-partial"
        if os.path.exists(tmp_dir):  # stale partial from a crashed run
            shutil.rmtree(tmp_dir)
        os.makedirs(tmp_dir)

        def write_one(i: int) -> None:
            img = cv2.resize(maps[i] * 255.0, dsize=self.out_size)
            img = np.clip(img, 0, 255).astype(np.uint8)
            cv2.imwrite(os.path.join(tmp_dir, f"frame_{i + 1}.jpg"), img)

        futs = [self._write_pool.submit(write_one, i)
                for i in range(maps.shape[0])]
        if wait:
            for f in futs:
                f.result()
            self._finalize_video(tmp_dir, save_dir)
        else:
            self._pending_videos.append((futs, tmp_dir, save_dir))
        return True

    @staticmethod
    def _finalize_video(tmp_dir: str, save_dir: str) -> None:
        if os.path.exists(save_dir):  # only with skip_existing=False
            shutil.rmtree(save_dir)
        os.rename(tmp_dir, save_dir)

    def flush_writes(self) -> None:
        """Block until all write-behind JPEG writes have completed and
        rename each completed video's tmp dir to its final name."""
        for futs, tmp_dir, save_dir in self._pending_videos:
            for f in futs:
                f.result()
            self._finalize_video(tmp_dir, save_dir)
        self._pending_videos.clear()

    def export_dataset(self, data_root: str, save_root: str) -> int:
        """All videos under data_root, sorted (reference gen_pred.py:70-86).

        Host/device overlap: while the device runs the windows of video N, a
        lookahead thread decodes video N+1 (the per-frame decode inside each
        video is already pooled)."""
        os.makedirs(save_root, exist_ok=True)
        todo = []
        for vname in sorted(os.listdir(data_root)):
            vdir = os.path.join(data_root, vname)
            if not os.path.isdir(vdir):
                continue
            sdir = os.path.join(save_root, vname)
            if not os.path.exists(sdir):  # skip-existing (gen_pred.py:83-86)
                todo.append((vdir, sdir))
        count = 0
        with ThreadPoolExecutor(1, thread_name_prefix="pred-ahead") as ahead:
            fut = None
            for i, (vdir, sdir) in enumerate(todo):
                frames = (
                    fut.result() if fut is not None
                    else self.prepare_video(self._video_paths(vdir))
                )
                fut = (
                    ahead.submit(
                        self.prepare_video, self._video_paths(todo[i + 1][0])
                    )
                    if i + 1 < len(todo) else None
                )
                if self.export_video(vdir, sdir, frames=frames, wait=False):
                    count += 1
        self.flush_writes()
        return count
