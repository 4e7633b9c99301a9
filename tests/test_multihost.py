"""REAL multi-process distributed training (SURVEY.md §2.9 multi-host DP).

Launches two actual OS processes, each a `sap3d_tpu.cli train --distributed`
run with 2 virtual CPU devices, joined through `jax.distributed.initialize`
(localhost coordinator, gloo CPU collectives).  This executes the code paths
that single-process tests cannot reach:

  * ``initialize_distributed`` with explicit coordinator kwargs;
  * ``jax.make_array_from_process_local_data`` inside ``shard_batch``
    (global arrays assembled from per-host loader shards);
  * the process-partitioned ClipLoader feeding disjoint clips per host;
  * collective Orbax checkpoint save across processes.

The loss trajectory must equal a single-process 4-device run on the same
synthetic dataset: the global batch is the same SET of clips per step
(partitioning is round-robin, shuffle disabled), the loss is a global SUM
(order-invariant), BN statistics are global-batch moments under GSPMD, and
dropout is disabled — so the math is identical to fp32 reduction order.

The subprocesses run WITHOUT the axon TPU backend on PYTHONPATH: two
processes must never share the tunneled TPU, and the test exercises CPU
sharding semantics by design.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _sub_env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO  # no axon sitecustomize: plain CPU jax
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}"
    )
    env.pop("PYTEST_CURRENT_TEST", None)
    return env


def _train_args(ds, max_steps: int) -> list[str]:
    return [
        sys.executable, "-m", "sap3d_tpu.cli", "train",
        "--structure", "p3d_micro",
        "--frames", ds["frame_dirs"], "--densities", ds["density_dirs"],
        "--overlap", "12", "--batch", "4", "--epoch", "4",
        "--imagesize", "32", "--threads", "2", "--dtype", "float32",
        "--dropout", "0.0", "--shuffle", "false",
        "--plotiter", "1", "--validiter", "100000", "--saveiter", "100000",
        "--max-steps", str(max_steps), "--info", "mh",
    ]


def _read_losses(workdir: str) -> list[tuple[int, float]]:
    logs = os.path.join(workdir, "logs")
    runs = os.listdir(logs)
    assert len(runs) == 1, runs
    out = []
    with open(os.path.join(logs, runs[0], "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "loss" in rec:
                out.append((rec["step"], rec["loss"]))
    return out


def test_two_process_distributed_matches_single_process(tmp_path):
    from sap3d_tpu.data.synthetic import make_synthetic_dataset

    ds = make_synthetic_dataset(
        str(tmp_path / "data"), num_videos=3, frames_per_video=40,
        size=(48, 36), with_fixations=False,
    )
    max_steps = 5

    # ---- 2 processes x 2 virtual devices, one shared workdir ----
    dist_dir = tmp_path / "dist"
    dist_dir.mkdir()
    port = _free_port()
    procs = []
    for pid in (0, 1):
        args = _train_args(ds, max_steps) + [
            "--distributed", "true",
            "--coordinator", f"localhost:{port}",
            "--num-processes", "2", "--process-id", str(pid),
        ]
        procs.append(subprocess.Popen(
            args, cwd=dist_dir, env=_sub_env(2),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = [p.communicate(timeout=780)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]
    assert "Training Finished!" in outs[0]

    # ---- single process x 4 virtual devices on the same data ----
    single_dir = tmp_path / "single"
    single_dir.mkdir()
    proc = subprocess.run(
        _train_args(ds, max_steps), cwd=single_dir, env=_sub_env(4),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=780,
    )
    assert proc.returncode == 0, proc.stdout[-4000:]

    dist_losses = _read_losses(str(dist_dir))
    single_losses = _read_losses(str(single_dir))
    assert len(dist_losses) >= 3
    assert [s for s, _ in dist_losses] == [s for s, _ in single_losses]
    d = np.array([v for _, v in dist_losses])
    s = np.array([v for _, v in single_losses])
    # identical math up to fp32 cross-device reduction order
    np.testing.assert_allclose(d, s, rtol=2e-4)
    # and training actually made progress
    assert d[-1] < d[0]

    # collective checkpoint: exactly one run dir with a restorable save
    model_runs = os.listdir(dist_dir / "model")
    assert len(model_runs) == 1
    ckpt_dir = dist_dir / "model" / model_runs[0]
    steps = [d for d in os.listdir(ckpt_dir) if d.isdigit()]
    assert steps, os.listdir(ckpt_dir)
