"""Data pipeline tests over a synthetic on-disk frame tree."""

import os

import numpy as np
import pytest

from sap3d_tpu.data.indexer import ClipIndex
from sap3d_tpu.data.pipeline import ClipLoader, decode_clip, preprocess_frame
from sap3d_tpu.data.synthetic import make_synthetic_dataset

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    roots = make_synthetic_dataset(
        str(root), num_videos=3, frames_per_video=40, with_fixations=True
    )
    return roots


def _index(roots, **kw):
    idx = ClipIndex(
        [roots["frame_dirs"]], [roots["density_dirs"]],
        fixation_dir=roots.get("fixation_dir"),
    )
    idx.setup(**kw)
    return idx


def test_clip_count_formula(dataset):
    """Clip starts: range(skip_head, total, L - overlap) with full-fit check
    (reference dataflow.py:44-52)."""
    idx = _index(dataset, overlap=15, training_props=0.9, skip_head=11)
    # per video: starts 11..(40-16)=24 step 1 -> 14 clips; 3 videos
    assert len(idx.tuples) == 3 * 14
    assert len(idx.train_tuples) == int(42 * 0.9)
    assert len(idx.valid_tuples) == 42 - int(42 * 0.9)


def test_clip_count_no_overlap(dataset):
    idx = _index(dataset, overlap=0, training_props=0.5, skip_head=11)
    # starts at 11 only (11+16=27<=40, 27+16=43>40) -> 1 clip per video
    assert len(idx.tuples) == 3


def test_materialized_paths_exist(dataset):
    idx = _index(dataset, overlap=15, training_props=0.9)
    clips = idx.train_clips()
    clip = clips[0]
    assert len(clip.frames) == 16 and len(clip.densities) == 16
    for p in clip.frames + clip.densities:
        assert os.path.exists(p), p
    # 1-based filenames (reference dataflow.py:96-97)
    first = os.path.basename(clip.frames[0])
    assert first == f"frame_{clip.start_frame + 1}.jpg"


def test_fixation_paths(dataset):
    idx = _index(dataset, overlap=15, training_props=0.0)
    clips = idx.valid_clips(with_fixations=True)
    assert clips and len(clips[0].fixations) == 16
    assert clips[0].fixations[0].endswith(".bmp")
    assert os.path.exists(clips[0].fixations[0])


def test_preprocess_order_parity():
    """RGB flip -> float mean-subtract -> resize -> /255 (reference
    dataflow.py:203-208).  Crucially the subtraction happens on floats BEFORE
    any resize, so no uint8 saturation can occur (the reference's cv2 path
    subtracts from a float-promoted array too)."""
    rng = np.random.default_rng(0)
    bgr = rng.integers(0, 255, size=(30, 40, 3), dtype=np.uint8)
    got = preprocess_frame(bgr, size=16)

    rgb = bgr[:, :, ::-1].astype(np.float32)
    expected = cv2.resize(rgb - np.array([90.0, 102.0, 98.0], np.float32),
                          (16, 16)) / 255.0
    # float-rounding tolerance: our pipeline applies the (linear) mean/scale
    # after the float resize, which commutes exactly up to fp rounding
    np.testing.assert_allclose(got, expected, atol=2e-5)
    # channel order check: swapping the mean across channels must NOT match
    wrong = cv2.resize(rgb - np.array([98.0, 102.0, 90.0], np.float32),
                       (16, 16)) / 255.0
    assert not np.allclose(got, wrong, atol=1e-4)


def test_decode_clip_shapes(dataset):
    idx = _index(dataset, overlap=15, training_props=0.9)
    frames, densities = decode_clip(idx.train_clips()[0], size=32)
    assert frames.shape == (16, 32, 32, 3) and frames.dtype == np.float32
    assert densities.shape == (16, 32, 32)
    assert densities.min() >= 0 and densities.max() <= 1.0


def test_decode_clip_test_mode(dataset):
    idx = _index(dataset, overlap=15, training_props=0.0)
    clip = idx.valid_clips(with_fixations=True)[0]
    frames, densities, fixations = decode_clip(clip, size=32, test_mode=True)
    assert densities.shape == (16, 1080, 960)  # reference dataflow.py:233
    assert fixations.shape == (16, 48, 64)  # native resolution


def test_loader_batches(dataset):
    idx = _index(dataset, overlap=15, training_props=0.9)
    loader = ClipLoader(
        idx.train_clips(), batch_size=2, size=32, num_threads=4, epochs=1
    )
    batches = list(loader)
    assert len(batches) == len(idx.train_tuples) // 2  # remainder dropped
    fr, de = batches[0]
    assert fr.shape == (2, 16, 32, 32, 3)
    assert de.shape == (2, 16, 32, 32)


def test_loader_epochs_and_shuffle_determinism(dataset):
    idx = _index(dataset, overlap=15, training_props=0.9)
    clips = idx.train_clips()[:4]
    l1 = ClipLoader(clips, 2, size=16, num_threads=2, epochs=2, seed=7)
    l2 = ClipLoader(clips, 2, size=16, num_threads=2, epochs=2, seed=7)
    b1 = [b[0].sum() for b in l1]
    b2 = [b[0].sum() for b in l2]
    assert len(b1) == 4  # 2 batches/epoch * 2 epochs
    np.testing.assert_allclose(b1, b2)


def test_frame_cache_hits_and_equivalence(dataset):
    """Cached loader produces identical batches and actually hits the cache
    (overlap=15 -> ~16x frame reuse)."""
    idx = _index(dataset, overlap=15, training_props=0.9)
    clips = idx.train_clips()[:8]
    plain = ClipLoader(clips, 2, size=16, num_threads=2, shuffle=False)
    cached = ClipLoader(clips, 2, size=16, num_threads=2, shuffle=False,
                        cache_frames=4096)
    for (f1, d1), (f2, d2) in zip(plain, cached):
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(d1, d2)
    # overlapping clips reuse frames (shuffled clip order, so not strictly
    # majority hits; concurrent decodes can also double-miss)
    assert cached.cache.hits > 50


def test_loader_per_epoch_remainder_drop():
    """Batches never straddle an epoch boundary: the reference batches BEFORE
    repeating (BatchData(remainder=False) under RepeatedData, reference
    train.py:105-108), so each epoch's remainder is dropped independently."""
    clips = list(range(5))  # 5 clips, batch 2 -> 2 batches + 1 dropped / epoch
    decode = lambda c: (np.full((1,), float(c), np.float32),)  # noqa: E731
    loader = ClipLoader(
        clips, batch_size=2, num_threads=2, epochs=3, shuffle=False,
        decode_fn=decode,
    )
    batches = [tuple(b[0].ravel().tolist()) for b in loader]
    assert len(batches) == len(loader) == 6
    # each epoch contributes exactly [0,1], [2,3]; clip 4 dropped every epoch
    assert batches == [(0.0, 1.0), (2.0, 3.0)] * 3


def test_loader_early_exit_stops_threads():
    """Abandoning iteration must stop the producer/feeder (no threads keep
    decoding behind the consumer's back)."""
    import threading
    import time

    decoded = []

    def decode(c):
        decoded.append(c)
        return (np.zeros((4,), np.float32),)

    loader = ClipLoader(
        list(range(500)), batch_size=2, num_threads=4, epochs=1,
        shuffle=False, prefetch=2, decode_fn=decode,
    )
    it = iter(loader)
    next(it)
    it.close()  # abandon after one batch
    loader.close()
    deadline = time.time() + 5.0
    while time.time() < deadline and any(
        t.name.startswith("clip-loader") for t in threading.enumerate()
    ):
        time.sleep(0.05)
    live = [t.name for t in threading.enumerate() if t.name.startswith("clip-loader")]
    assert not live, live
    n_after_close = len(decoded)
    time.sleep(0.3)
    assert len(decoded) == n_after_close  # nothing decoded after shutdown


def test_loader_decode_backpressure():
    """Decode never runs more than one bounded window ahead of the consumer
    (an unbounded futures queue would decode the whole epoch eagerly)."""
    import time

    decoded = []

    def decode(c):
        decoded.append(c)
        return (np.zeros((4,), np.float32),)

    batch, threads, prefetch = 2, 4, 2
    with ClipLoader(
        list(range(400)), batch_size=batch, num_threads=threads, epochs=1,
        shuffle=False, prefetch=prefetch, decode_fn=decode,
    ) as loader:
        it = iter(loader)
        next(it)  # consume one batch, then stall
        time.sleep(0.5)
        # bound: window (threads + prefetch*batch) + buf (prefetch*batch)
        # + one batch consumed + in-flight slack
        bound = (threads + prefetch * batch) + prefetch * batch + batch + threads
        assert len(decoded) <= bound, (len(decoded), bound)
        it.close()


def test_loader_propagates_decode_errors():
    def decode(c):
        if c == 3:
            raise ValueError("boom")
        return (np.zeros((2,), np.float32),)

    loader = ClipLoader(
        list(range(8)), batch_size=2, num_threads=2, epochs=1, shuffle=False,
        decode_fn=decode,
    )
    with pytest.raises(ValueError, match="boom"):
        list(loader)
    loader.close()


def test_multihost_partition_disjoint_exhaustive():
    """Per-host data sharding (SURVEY section 2.9): with the same seed, the
    process-indexed loaders see disjoint, equal-size partitions whose union
    is the (truncated) epoch — per epoch, including reshuffles."""
    clips = list(range(23))
    decode = lambda c: (np.full((1,), float(c), np.float32),)  # noqa: E731
    count = 4
    per_epoch: list[list[list[float]]] = []  # [host][epoch] -> clip ids
    for idx in range(count):
        loader = ClipLoader(
            clips, batch_size=1, num_threads=2, epochs=2, shuffle=True,
            seed=3, decode_fn=decode, process_index=idx, process_count=count,
        )
        seen = [b[0].ravel()[0] for b in loader]
        assert len(seen) == len(loader) == 2 * (23 // 4)
        per_epoch.append([seen[: 23 // 4], seen[23 // 4 :]])
    for epoch in range(2):
        all_ids = [i for h in range(count) for i in per_epoch[h][epoch]]
        assert len(all_ids) == len(set(all_ids)) == 20  # disjoint, 3 dropped
    # different epochs shuffle differently (reshuffle actually happens)
    assert per_epoch[0][0] != per_epoch[0][1]


def test_multihost_batch_shapes(dataset):
    """Per-host loader yields per-host-batch-sized arrays."""
    idx = _index(dataset, overlap=15, training_props=0.9)
    clips = idx.train_clips()[:12]
    loader = ClipLoader(
        clips, batch_size=2, size=16, num_threads=2, shuffle=False,
        process_index=1, process_count=2,
    )
    batches = list(loader)
    assert len(batches) == 3  # 12 clips / 2 hosts / batch 2
    assert batches[0][0].shape == (2, 16, 16, 16, 3)


def test_frame_cache_eviction():
    from sap3d_tpu.data.pipeline import FrameCache

    cache = FrameCache(capacity=2)
    calls = []

    def make(v):
        def dec():
            calls.append(v)
            return np.full((2, 2), v, np.float32)
        return dec

    a = cache.get_or_decode(("a",), make(1.0))
    cache.get_or_decode(("b",), make(2.0))
    cache.get_or_decode(("a",), make(1.0))  # hit
    cache.get_or_decode(("c",), make(3.0))  # evicts b
    cache.get_or_decode(("b",), make(2.0))  # miss again
    assert calls == [1.0, 2.0, 3.0, 2.0]
    assert not a.flags.writeable


def test_unreadable_frame_fails_loudly(tmp_path):
    """cv2 returns None for missing/corrupt files; the pipeline must raise
    an error naming the file instead of an opaque TypeError in a worker."""
    import cv2
    import pytest

    from sap3d_tpu.data.pipeline import imread_checked

    with pytest.raises(FileNotFoundError, match="nope_frame_3.jpg"):
        imread_checked(str(tmp_path / "nope_frame_3.jpg"), cv2.IMREAD_COLOR)
    bad = tmp_path / "corrupt_frame_4.jpg"
    bad.write_bytes(b"not a jpeg")
    # existing-but-undecodable files raise ValueError, NOT FileNotFoundError
    # (callers catching FileNotFoundError mean "missing file")
    with pytest.raises(ValueError, match="corrupt_frame_4.jpg"):
        imread_checked(str(bad), cv2.IMREAD_COLOR)
