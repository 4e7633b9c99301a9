"""Tests for auxiliary subsystems: curve plotting, checkpoint inspection,
config parsing."""

import json
import os

import numpy as np
import pytest

from sap3d_tpu.core.config import Config, parse_bool
from sap3d_tpu.train.plotting import load_metrics, plot_curves


def test_parse_bool_strict():
    """The reference's type=bool argparse quirk is fixed (train.py:38 there
    parses any non-empty string as True)."""
    assert parse_bool("False") is False
    assert parse_bool("false") is False
    assert parse_bool("0") is False
    assert parse_bool("True") is True
    assert parse_bool(True) is True
    with pytest.raises(ValueError):
        parse_bool("maybe")


def test_config_immutable_defaults():
    cfg = Config()
    assert cfg.train.lr == 1e-4  # reference train.py:40
    assert cfg.train.batch_size == 2  # reference train.py:39
    assert cfg.data.overlap == 15  # reference train.py:33
    assert cfg.data.skip_head == 11  # reference dataflow.py:39
    with pytest.raises(Exception):
        cfg.train.lr = 1.0  # frozen dataclass


def test_infer_structure_from_run_name():
    """The eval sweep resolves each run dir's model variant from its name
    (reference test.py:129-136 parses structure per modelList entry)."""
    from sap3d_tpu.cli import infer_structure_from_run_name as infer

    assert infer("p3d_unetplusplus_ds_2_0.0001__2026-08-16") == "p3d_unetplusplus_ds"
    # longest match wins over the "p3d_unetplusplus" prefix
    assert infer("p3d_unetplusplus_2_0.0001__2026-08-16") == "p3d_unetplusplus"
    assert infer("unet++_2_0.0001__2026-08-16") == "unet++"
    assert infer("inference_p3d_sa_concat_2_4_0.0001_x_d") == (
        "inference_p3d_sa_concat_2"
    )
    assert infer("/models/p3d_unet_8_0.001_info_2026-01-01/") == "p3d_unet"
    assert infer("totally_unrelated") is None


def test_eval_datasets_map():
    """All 9 reference eval_vid.py dataset names resolve to dir triples."""
    from sap3d_tpu.core.config import EVAL_DATASETS

    assert set(EVAL_DATASETS) == {
        "videoset", "msu", "ledov", "hollywood", "dhf1k", "diem", "gazecom",
        "coutort2", "svsd",
    }
    for name, ds in EVAL_DATASETS.items():
        assert set(ds) == {"density_dir", "saliency_dir", "fixation_dir"}, name


def test_plot_curves_from_metrics_log(tmp_path):
    logs = tmp_path / "run"
    logs.mkdir()
    records = [
        {"step": 1, "loss": 100.0},
        {"step": 2, "loss": 50.0},
        {"step": 2, "cc": 0.5, "sim": 0.4, "auc_judd": 0.7},
    ]
    with open(logs / "metrics.jsonl", "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    assert len(load_metrics(str(logs))) == 3
    out = plot_curves(str(logs))
    assert out and os.path.exists(out)
    assert os.path.getsize(out) > 1000  # a real PNG


def test_inspect_checkpoint(tmp_path):
    import jax

    from sap3d_tpu.models.p3d import P3DSaliency
    from sap3d_tpu.train.checkpoint import CheckpointManager
    from sap3d_tpu.train.inspect_ckpt import inspect
    from sap3d_tpu.train.state import create_train_state

    model = P3DSaliency(
        decoder="unetpp", decoder_kwargs=dict(attention="none", head="ds"),
        norm_mode="bn", stages=((4, 1), (4, 1), (4, 1)), stem_features=4,
    )
    state = create_train_state(
        model, jax.random.PRNGKey(0), input_shape=(1, 16, 16, 16, 3)
    )
    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=1)
    mgr.save(state, 7)
    mgr.close()

    rows = inspect(str(tmp_path / "ck"))
    assert rows
    names = [n for n, _ in rows]
    assert any("stem" in n for n in names)
    # filtering works (reference utils/test_model.py printed conv vars only)
    stem_rows = inspect(str(tmp_path / "ck"), "stem")
    assert 0 < len(stem_rows) < len(rows)


def test_tb_event_writer_tf_readable(tmp_path):
    """The hand-encoded event file must be readable by TensorFlow's own
    summary_iterator (the authoritative reader of what the reference's
    FileWriter wrote, reference train.py:164,176-177)."""
    tf = __import__("pytest").importorskip("tensorflow")

    from sap3d_tpu.train.tb_events import EventWriter

    w = EventWriter(str(tmp_path))
    w.scalar("total_loss", 12.5, step=3)
    w.scalars({"step": 7, "loss": 0.25, "clips_per_sec": 148.0,
               "time": "2026-08-17T00:00:00"}, step=7)
    w.flush()
    w.close()

    got = []
    for ev in tf.compat.v1.train.summary_iterator(w.path):
        for v in ev.summary.value:
            got.append((v.tag, round(float(v.simple_value), 4), ev.step))
    assert ("total_loss", 12.5, 3) in got
    assert ("loss", 0.25, 7) in got
    assert ("clips_per_sec", 148.0, 7) in got
    assert not any(tag == "time" for tag, _, _ in got)  # non-numeric skipped


def test_async_checkpoint_semantics(tmp_path):
    """save() is async (no per-save barrier); restore() barriers on any
    in-flight save so it never reads a half-written checkpoint, and
    back-to-back saves + keep-K retention still work."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sap3d_tpu.models.p3d import P3DSaliency
    from sap3d_tpu.train.checkpoint import CheckpointManager
    from sap3d_tpu.train.state import create_train_state

    model = P3DSaliency(
        decoder="unetpp", decoder_kwargs=dict(attention="none", head="ds"),
        norm_mode="bn", stages=((4, 1), (4, 1), (4, 1)), stem_features=4,
    )
    state = create_train_state(
        model, jax.random.PRNGKey(0), input_shape=(1, 16, 16, 16, 3)
    )
    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    try:
        # three quick saves with mutated params, no explicit waits between
        for step in (1, 2, 3):
            state = state.replace(
                params=jax.tree.map(lambda p: p + step, state.params),
                step=jnp.asarray(step),
            )
            mgr.save(state, step)
        # restore immediately (must barrier internally) and match step 3
        restored = mgr.restore(state)
        for a, b in zip(jax.tree.leaves(restored.params),
                        jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(restored.step) == 3
        mgr.wait_until_finished()  # explicit barrier is idempotent
        assert mgr.latest_step() == 3
    finally:
        mgr.close()
