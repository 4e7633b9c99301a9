"""End-to-end slice: synthetic frames -> loader -> train -> predict -> eval.

Exercises the whole stack (SURVEY.md section 7 minimum slice) with a micro
P3D so CPU compile stays manageable.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sap3d_tpu.data.indexer import ClipIndex
from sap3d_tpu.data.pipeline import ClipLoader
from sap3d_tpu.data.synthetic import make_synthetic_dataset
from sap3d_tpu.eval.evaluator import evaluate_saliency_dirs
from sap3d_tpu.infer.predictor import SlidingWindowPredictor
from sap3d_tpu.infer.video import frames_to_video
from sap3d_tpu.models.p3d import P3DSaliency
from sap3d_tpu.train.checkpoint import CheckpointManager
from sap3d_tpu.train.state import create_train_state
from sap3d_tpu.train.steps import make_eval_step, make_train_step

cv2 = pytest.importorskip("cv2")

SIZE = 32  # decode size (divisible by 16)


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    return make_synthetic_dataset(
        str(root), num_videos=2, frames_per_video=36, size=(64, 48)
    )


def micro_model():
    return P3DSaliency(
        decoder="unetpp",
        decoder_kwargs=dict(attention="sa", head="ds"),
        norm_mode="bn",
        stages=((8, 1), (16, 1), (32, 1)),
        stem_features=8,
    )


def test_end_to_end(roots, tmp_path):
    idx = ClipIndex([roots["frame_dirs"]], [roots["density_dirs"]]).setup(
        overlap=12, training_props=0.9
    )
    loader = ClipLoader(
        idx.train_clips(), batch_size=2, size=SIZE, num_threads=4, epochs=2
    )

    model = micro_model()
    shape = (2, 16, SIZE, SIZE, 3)
    state = create_train_state(model, jax.random.PRNGKey(0), input_shape=shape,
                               lr=1e-3)
    step = make_train_step(model, donate=False)

    losses = []
    rng = jax.random.PRNGKey(1)
    for frames, targets in loader:
        rng, r = jax.random.split(rng)
        state, loss = step(state, jnp.asarray(frames), jnp.asarray(targets), r)
        losses.append(float(loss))
    assert len(losses) >= 4
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # checkpoint round-trip
    ckdir = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckdir, max_to_keep=2)
    mgr.save(state)
    state2 = create_train_state(model, jax.random.PRNGKey(9), input_shape=shape)
    state2 = mgr.restore(state2)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state.params)[0]),
        np.asarray(jax.tree.leaves(state2.params)[0]),
    )
    mgr.close()

    # sliding-window prediction + export
    ev = make_eval_step(model)
    pred = SlidingWindowPredictor(
        lambda clips: ev(state, clips), batch_windows=4, image_size=SIZE,
        out_size=(64, 48),
    )
    out_root = str(tmp_path / "pred")
    video0 = sorted(os.listdir(roots["frame_dirs"]))[0]
    ok = pred.export_video(
        os.path.join(roots["frame_dirs"], video0),
        os.path.join(out_root, video0),
    )
    assert ok
    exported = os.listdir(os.path.join(out_root, video0))
    assert len(exported) == 36  # every frame emitted (stride-1 protocol)
    # skip-existing behavior (reference gen_pred.py:83-86)
    assert not pred.export_video(
        os.path.join(roots["frame_dirs"], video0),
        os.path.join(out_root, video0),
    )

    # directory evaluator (MATLAB-path replacement)
    scores = evaluate_saliency_dirs(
        out_root, roots["density_dirs"], metrics=("cc", "sim")
    )
    assert video0 in scores
    assert np.isfinite(scores[video0]["cc"])

    # video assembly (gen_video parity)
    avi = str(tmp_path / "out.avi")
    n = frames_to_video(os.path.join(out_root, video0), avi)
    assert n > 0 and os.path.exists(avi)


def test_sliding_window_emission_protocol(roots):
    """First window emits frames 1..16; window starting at s emits frame
    s+16 only (reference gen_pred.py:154-168)."""
    model = micro_model()
    shape = (3, 16, SIZE, SIZE, 3)
    state = create_train_state(model, jax.random.PRNGKey(0), input_shape=shape)
    ev = make_eval_step(model)
    pred = SlidingWindowPredictor(
        lambda clips: ev(state, clips), batch_windows=3, image_size=SIZE
    )
    vdir = os.path.join(roots["frame_dirs"], sorted(os.listdir(roots["frame_dirs"]))[0])
    paths = [os.path.join(vdir, f) for f in os.listdir(vdir)]
    maps = pred.predict_video(paths)
    assert maps.shape == (36, SIZE, SIZE)
    assert np.isfinite(maps).all()
    # every output frame has an emission (no zeros left over)
    assert (np.abs(maps).reshape(36, -1).sum(1) > 0).all()
