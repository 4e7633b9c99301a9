"""Host decode/augment pipeline feeding clips to the TPU.

Replaces the reference's tensorpack chain
``ImageFromFile -> MultiThreadMapData(32) -> BatchData -> PrefetchDataZMQ``
(reference train.py:99-119) with a thread-pool decoder plus a bounded
prefetch queue; device transfer happens via ``jax.device_put`` with the
target sharding so each host only ships its local shard.

Preprocessing order parity is critical for metric parity (SURVEY.md
section 7, "hard parts"): frames are read BGR, flipped to RGB, mean-subtracted
with the REVERSED BGR mean [98,102,90] -> RGB [90,102,98], THEN resized to
112, THEN divided by 255 (reference dataflow.py:194-209).  Density maps are
read grayscale, resized, /255 (reference dataflow.py:210-215).  The test-mode
variant resizes densities to (960,1080) and keeps fixations at native
resolution (reference dataflow.py:219-240).
"""

from __future__ import annotations

import os
import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Sequence

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in the target image
    cv2 = None

from sap3d_tpu.data.indexer import ClipPaths

# RGB-order mean (reference dataflow.py:194-196: BGR [98,102,90] reversed).
_RGB_MEAN = np.array([90.0, 102.0, 98.0], dtype=np.float32)


def _require_cv2():
    if cv2 is None:
        raise ImportError("cv2 is required for JPEG decoding")


class FrameCache:
    """Thread-safe LRU cache of decoded+preprocessed frames.

    With the reference's default overlap=15 indexing, consecutive clips share
    15 of their 16 frames, so the raw pipeline decodes every JPEG ~16 times
    (SURVEY.md section 7 "hard parts").  Caching the preprocessed float
    frames turns that into ~1 decode per frame per epoch.  A 112x112x3
    float32 frame is ~150KB; capacity is in frames.
    """

    def __init__(self, capacity: int):
        from collections import OrderedDict

        self.capacity = capacity
        self._data: "OrderedDict[tuple, np.ndarray]" = OrderedDict()
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def get_or_decode(self, key: tuple, decode) -> np.ndarray:
        with self._lock:
            if key in self._data:
                self._data.move_to_end(key)
                self.hits += 1
                return self._data[key]
        value = decode()  # decode outside the lock (cv2 releases the GIL)
        value.flags.writeable = False
        with self._lock:
            self.misses += 1
            self._data[key] = value
            self._data.move_to_end(key)
            while len(self._data) > self.capacity:
                self._data.popitem(last=False)
        return value


def imread_checked(path: str, flags: int) -> np.ndarray:
    """cv2.imread that FAILS LOUDLY: cv2 returns None on missing/corrupt
    files, which otherwise surfaces as an opaque TypeError deep inside a
    decode worker thread.  Name the file instead."""
    img = cv2.imread(path, flags)
    if img is None:
        if os.path.exists(path):
            raise ValueError(
                f"cv2 could not decode {path!r} (file exists but is "
                "corrupt or not a supported image format)"
            )
        raise FileNotFoundError(f"cv2 could not decode {path!r}: no such file")
    return img


def preprocess_frame(bgr: np.ndarray, size: int = 112) -> np.ndarray:
    """BGR uint8 frame -> float32 [size,size,3] with reference semantics:
    RGB flip, float-promote, mean-subtract, bilinear resize, /255
    (reference dataflow.py:203-208).

    Implementation note: every heavy op here is a cv2 call that releases the
    GIL, so 16 decode threads actually scale (a numpy `im - mean` on the
    full-res float frame holds the GIL ~2.5ms and serializes the pool).  The
    mean-subtract and /255 are applied AFTER the float resize — bilinear
    interpolation is linear, so resize(float(x) - m)/255 ==
    (resize(float(x)) - m)/255 exactly up to float rounding; the promotion to
    float happens BEFORE the resize, which is what actually changes pixel
    values vs resizing uint8 (cv2's uint8 path rounds).
    """
    rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    # GIL-free uint8 -> float32 conversion
    fl = cv2.multiply(rgb, (1.0, 1.0, 1.0, 1.0), dtype=cv2.CV_32F)
    small = cv2.resize(fl, (size, size), interpolation=cv2.INTER_LINEAR)
    # tiny (size x size) numpy epilogue; values match the reference order
    return (small - _RGB_MEAN) * np.float32(1.0 / 255.0)


def preprocess_density(gray: np.ndarray, size: int | tuple[int, int] = 112) -> np.ndarray:
    """Grayscale density map -> float32, resized, /255 (dataflow.py:210-215).

    The reference resizes the uint8 map then divides (dataflow.py:213-214),
    so the uint8 resize path (with its rounding) is kept here.
    """
    if isinstance(size, int):
        size = (size, size)
    im = cv2.resize(gray, size, interpolation=cv2.INTER_LINEAR)
    return im.astype(np.float32) * np.float32(1.0 / 255.0)


def decode_clip(
    clip: ClipPaths,
    size: int = 112,
    test_mode: bool = False,
    cache: FrameCache | None = None,
) -> tuple[np.ndarray, np.ndarray] | tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one clip: frames [T,H,W,3], densities [T,h,w] (+ fixations).

    test_mode resizes densities to (960,1080) and loads fixations at native
    resolution (reference mapf_test, dataflow.py:219-240).
    """
    _require_cv2()

    def frame(p):
        dec = lambda: preprocess_frame(imread_checked(p, cv2.IMREAD_COLOR), size)  # noqa: E731
        return cache.get_or_decode(("f", p, size), dec) if cache else dec()

    dsize = (960, 1080) if test_mode else size

    def density(p):
        dec = lambda: preprocess_density(  # noqa: E731
            imread_checked(p, cv2.IMREAD_GRAYSCALE), dsize)
        return cache.get_or_decode(("d", p, dsize), dec) if cache else dec()

    frames = np.stack([frame(p) for p in clip.frames])
    densities = np.stack([density(p) for p in clip.densities])
    if not test_mode:
        return frames, densities
    fixations = np.stack(
        [imread_checked(p, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
         for p in clip.fixations]
    )
    return frames, densities, fixations


# Stream control tokens (identity-compared).
_EPOCH_END = object()  # per-epoch remainder drop boundary
_DONE = object()  # clean end of stream
_STOPPED = object()  # shutdown requested


class _Error:
    """Wraps a worker exception for re-raise on the consumer thread."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class _LoaderIter:
    """One live iteration of a ClipLoader: feeder + decode pool + producer.

    Backpressure: the ``window`` queue of in-flight decode futures is bounded
    to ``num_threads + prefetch * batch_size``, so when the consumer stalls the
    feeder blocks *before* submitting more work — decode never runs more than
    one prefetch window ahead (an unbounded futures queue would accumulate
    ~3MB decoded clips without limit on real datasets).

    Shutdown: ``close()`` sets a stop event; every blocking queue op here is a
    short-timeout loop that re-checks the event, so the feeder and producer
    exit within ~0.1s and the pool drains its (bounded) in-flight decodes.
    """

    def __init__(self, loader: "ClipLoader"):
        self.loader = loader
        self._stop = threading.Event()
        self._buf: queue.Queue = queue.Queue(
            maxsize=loader.prefetch * loader.batch_size
        )
        self._window: queue.Queue = queue.Queue(
            maxsize=loader.num_threads + loader.prefetch * loader.batch_size
        )
        self._producer = threading.Thread(
            target=self._produce, name="clip-loader-producer", daemon=True
        )
        self._producer.start()

    # -- stop-aware queue ops ------------------------------------------------

    def _qput(self, q: queue.Queue, item) -> bool:
        while not self._stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                pass
        return False

    def _qget(self, q: queue.Queue):
        while not self._stop.is_set():
            try:
                return q.get(timeout=0.1)
            except queue.Empty:
                pass
        return _STOPPED

    # -- pipeline threads ----------------------------------------------------

    def _produce(self):
        loader = self.loader
        try:
            with ThreadPoolExecutor(loader.num_threads) as pool:

                def feed():
                    # Submit in order, consume in order: parallel decode with
                    # deterministic batch composition.
                    for item in loader._clip_stream():
                        if self._stop.is_set():
                            return
                        if item is not _EPOCH_END:
                            item = pool.submit(loader.decode_fn, item)
                        if not self._qput(self._window, item):
                            return
                    self._qput(self._window, _DONE)

                feeder = threading.Thread(
                    target=feed, name="clip-loader-feeder", daemon=True
                )
                feeder.start()
                try:
                    while True:
                        fut = self._qget(self._window)
                        if fut is _STOPPED or fut is _DONE:
                            break
                        item = fut if fut is _EPOCH_END else fut.result()
                        if not self._qput(self._buf, item):
                            break
                finally:
                    self._stop_feeder_if_closing(feeder)
        except BaseException as e:  # decode error: forward to the consumer
            self._qput(self._buf, _Error(e))
            return
        self._qput(self._buf, _DONE)

    def _stop_feeder_if_closing(self, feeder: threading.Thread):
        # On clean _DONE the feeder has already exited; on stop it exits on
        # its next 0.1s timeout.  Join so the pool's `with` exit only waits
        # for in-flight decodes, never for new submissions.
        feeder.join(timeout=5.0)

    # -- consumer API ----------------------------------------------------------

    def get(self):
        """Next decoded clip, or a control token.

        Never hangs: if the loader is closed from another thread (or the
        producer died) while we wait, this returns _DONE on the next tick.
        """
        while True:
            try:
                return self._buf.get(timeout=0.1)
            except queue.Empty:
                if self._stop.is_set() or not self._producer.is_alive():
                    return _DONE

    def close(self):
        """Stop all pipeline threads; safe to call more than once."""
        self._stop.set()
        # Drain the buffer so a blocked producer put() wakes and exits.
        while self._producer.is_alive():
            try:
                self._buf.get_nowait()
            except queue.Empty:
                self._producer.join(timeout=0.05)


class ClipLoader:
    """Threaded, shuffling, batching clip loader with bounded prefetch.

    Equivalent role to the reference's tensorpack pipeline (train.py:99-108):
    per-epoch shuffle of the clip list, ``num_threads`` parallel decoders,
    fixed-size batches with the remainder dropped *per epoch* (the reference
    batches before repeating: BatchData(remainder=False) under RepeatedData,
    train.py:105-108), ``prefetch`` batches ready ahead of the consumer.  The
    ZMQ process boundary is unnecessary: decoding releases the GIL inside cv2,
    and the accelerator step runs on device.

    Lifecycle: iteration stops its worker threads when the generator is
    closed/garbage-collected; ``close()`` (or use as a context manager) stops
    any still-live iterations explicitly, so abandoning iteration early leaves
    no threads decoding behind the consumer's back.
    """

    def __init__(
        self,
        clips: Sequence[ClipPaths],
        batch_size: int,
        size: int = 112,
        num_threads: int = 16,
        prefetch: int = 4,
        shuffle: bool = True,
        epochs: int = 1,
        seed: int = 0,
        test_mode: bool = False,
        decode_fn: Callable | None = None,
        cache_frames: int = 0,
        process_index: int = 0,
        process_count: int = 1,
    ):
        """``batch_size`` is the PER-HOST batch; on a multi-host slice each
        process constructs a loader with its own ``jax.process_index()`` /
        ``jax.process_count()`` and the global batch is
        ``batch_size * process_count`` (assembled device-side by
        core/mesh.py shard_batch).

        Per-host data sharding (SURVEY.md section 2.9 DP plan): every host
        shuffles the SAME clip order with the same seed, truncates to a
        multiple of ``process_count``, then takes the strided slice
        ``order[process_index::process_count]`` — partitions are disjoint,
        their union is exhaustive (up to the dropped remainder), and every
        host yields exactly the same number of batches per epoch, which SPMD
        stepping requires.
        """
        assert 0 <= process_index < process_count, (process_index, process_count)
        self.clips = list(clips)
        self.batch_size = batch_size
        self.process_index = process_index
        self.process_count = process_count
        self.size = size
        self.num_threads = num_threads
        self.prefetch = max(1, prefetch)
        self.shuffle = shuffle
        self.epochs = epochs
        self.seed = seed
        self.test_mode = test_mode
        self.cache = FrameCache(cache_frames) if cache_frames > 0 else None
        self.decode_fn = decode_fn or (
            lambda c: decode_clip(c, self.size, self.test_mode, self.cache)
        )
        self._iters: list[_LoaderIter] = []

    def _per_host_count(self) -> int:
        """Clips this host sees per epoch (equal across hosts)."""
        return len(self.clips) // self.process_count

    def __len__(self) -> int:
        # remainder dropped per epoch (reference BatchData(remainder=False)
        # before RepeatedData, train.py:105-108)
        return (self._per_host_count() // self.batch_size) * self.epochs

    def _clip_stream(self) -> Iterator:
        rng = random.Random(self.seed)
        for _ in range(self.epochs):
            order = list(self.clips)
            if self.shuffle:
                rng.shuffle(order)
            if self.process_count > 1:
                usable = self._per_host_count() * self.process_count
                order = order[: usable][self.process_index :: self.process_count]
            yield from order
            yield _EPOCH_END

    def __iter__(self) -> Iterator[tuple[np.ndarray, ...]]:
        """Yields batches of stacked arrays, e.g. (frames [B,T,H,W,3], gts [B,T,H,W])."""
        it = _LoaderIter(self)
        self._iters.append(it)
        batch: list[tuple[np.ndarray, ...]] = []
        try:
            while True:
                item = it.get()
                if item is _DONE:
                    break
                if item is _EPOCH_END:
                    batch = []  # drop remainder (BatchData(remainder=False))
                    continue
                if isinstance(item, _Error):
                    raise item.exc
                batch.append(item)
                if len(batch) == self.batch_size:
                    n_fields = len(batch[0])
                    yield tuple(
                        np.stack([b[i] for b in batch]) for i in range(n_fields)
                    )
                    batch = []
        finally:
            it.close()
            if it in self._iters:
                self._iters.remove(it)

    def close(self):
        """Stop worker threads of any live iterations (idempotent)."""
        for it in list(self._iters):
            it.close()
        self._iters.clear()

    def __enter__(self) -> "ClipLoader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
