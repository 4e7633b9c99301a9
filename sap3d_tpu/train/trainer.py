"""The training loop: data in, jitted steps, logging, validation, checkpoints.

Equivalent of reference train.py:136-268 (and the GN trainer
gn/train_p3d_gn_dataset.py), TPU-native:

* batches stream from the host ClipLoader and are device_put with the batch
  axis sharded over the data-parallel mesh (replacing feed_dict + ZMQ);
* one jitted train step fuses forward/backward/Adam/BN updates, with the
  state donated so parameters update in place in HBM;
* the periodic side-dumps (pred/GT JPEG pairs, reference train.py:227-239),
  scalar logging, validation metric pass (CC/SIM/AUC-Judd on the last frame
  of each clip, NaN-filtered means, reference train.py:243-264) and
  keep-last-K checkpointing are preserved;
* the whole validation metric pass (CC/SIM/KLD/AUC-Judd) runs vectorized on
  device (eval/metrics_jax.py), including the AUC threshold sweep.
"""

from __future__ import annotations

import datetime
import json
import os
import time
import warnings
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from sap3d_tpu.core import mesh as mesh_lib
from sap3d_tpu.core.config import Config
from sap3d_tpu.eval import metrics as host_metrics
from sap3d_tpu.eval import metrics_jax
from sap3d_tpu.models.registry import build_model, resolve_name
from sap3d_tpu.train.checkpoint import CheckpointManager, try_restore_latest
from sap3d_tpu.train.state import create_train_state
from sap3d_tpu.train.steps import (
    make_eval_step,
    make_multi_train_step,
    make_train_step,
)

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def run_name(cfg: Config) -> str:
    """dataset_structure_batch_lr_info_date (reference train.py:127)."""
    t = datetime.date.today().isoformat()
    return (
        f"{cfg.model.name}_{cfg.train.batch_size}_{cfg.train.lr}_"
        f"{cfg.train.info}_{t}"
    )


class Trainer:
    def __init__(self, cfg: Config, run: str | None = None):
        self.cfg = cfg
        self.run = run or run_name(cfg)
        self.model_dir = os.path.join(cfg.train.model_dir, self.run)
        self.logs_dir = os.path.join(cfg.train.logs_dir, self.run)
        os.makedirs(self.model_dir, exist_ok=True)
        os.makedirs(self.logs_dir, exist_ok=True)

        if cfg.train.debug_nans:
            jax.config.update("jax_debug_nans", True)

        b = cfg.train.batch_size
        t, s = cfg.data.video_length, cfg.data.image_size
        # Long-clip mode: a 1-D mesh over the clip's TIME axis instead of
        # the batch axis (sequence parallelism, SURVEY.md section 2.9's
        # long-context stretch).  The jitted steps follow the committed
        # input shardings (no explicit mesh arg); SA variants additionally
        # run their attention sites as shard_map rings so no [Nq, Nk] block
        # spans the full clip (ops/ring_attention.py; parity + flagship-
        # scale memory feasibility in tests/test_ring_attention.py).
        self.time_shards = int(cfg.train.time_shards or 0)
        if self.time_shards > 1:
            if jax.process_count() > 1:
                raise NotImplementedError(
                    "--time-shards is single-process: a multi-host time mesh "
                    "would put temporal halo exchanges on DCN")
            if self.time_shards > jax.device_count():
                raise ValueError(
                    f"--time-shards {self.time_shards} exceeds the "
                    f"{jax.device_count()} available devices")
            if t % (16 * self.time_shards):
                raise ValueError(
                    f"--videolength {t} must be a multiple of 16x"
                    f"--time-shards {self.time_shards} (the encoder pools "
                    "time by 16; every shard needs >= 1 frame at pool4)")
            self.time_mesh = mesh_lib.make_time_mesh(self.time_shards)
        else:
            self.time_mesh = None
        self.mesh = mesh_lib.make_mesh(
            1 if self.time_mesh is not None else cfg.train.num_devices)
        # BN batch stats are ALWAYS global-batch under this trainer: the
        # step is jit+GSPMD with the batch sharded on 'data', so BN's mean/
        # var reductions span the global batch and XLA inserts the
        # cross-device collectives automatically (proven by the DP-vs-
        # single-device loss-trajectory parity test, tests/test_sharding.py).
        # Passing a flax axis_name here would require a pmap/shard_map-bound
        # axis and crashes under jit — sync_bn is therefore an (accepted)
        # no-op knob; axis_name stays available on the modules for
        # shard_map embedders (core/config.py:sync_bn).
        if cfg.train.sync_bn:
            warnings.warn(
                "--sync-bn has no effect: BN statistics are ALWAYS "
                "global-batch under this trainer's jit+GSPMD step (XLA "
                "inserts the cross-device reductions), which is what "
                "sync-BN asks for.  The reference's per-GPU-stats BN "
                "(train.py UPDATE_OPS) is deliberately NOT reproduced; "
                "see docs/DESIGN.md 'Batch statistics'.",
                stacklevel=2,
            )
        model_kw = dict(
            dtype=cfg.model.dtype,
            dropout_rate=cfg.model.dropout,
        )
        self.model = build_model(
            resolve_name(cfg.model.name),
            ring_mesh=(self.time_mesh
                       if self.time_mesh is not None
                       and cfg.train.ring_attention else None),
            **model_kw,
        )
        if (self.time_mesh is not None and cfg.train.ring_attention
                and self.model.decoder != "unetpp"):
            # P3DSaliency only threads ring_mesh into SA-capable decoders;
            # everything else takes the (correct) GSPMD gather path.
            print(f"[time-shards] decoder '{self.model.decoder}' has no "
                  "ring-attention sites; using the GSPMD gather path")
        # Init with a ring-free twin at the reference clip length: the param
        # tree is T-invariant and identical with/without ring_mesh
        # (tests/test_ring_attention.py builds states exactly this way), and
        # an unsharded eager init at the full long-clip T would materialize
        # the very activations time sharding exists to split.
        init_model = (build_model(resolve_name(cfg.model.name), **model_kw)
                      if self.time_mesh is not None else self.model)
        t_init = 16 if self.time_mesh is not None else t
        self.state = create_train_state(
            init_model,
            jax.random.PRNGKey(cfg.train.seed),
            input_shape=(b, t_init, s, s, 3),
            lr=cfg.train.lr,
            weight_decay=cfg.train.weight_decay,
        )
        self.steps_per_call = max(1, cfg.train.steps_per_call)
        step_mesh = None if self.time_mesh is not None else self.mesh
        if self.steps_per_call > 1:
            self.multi_step = make_multi_train_step(
                self.model, self.steps_per_call, mesh=step_mesh
            )
        self.train_step = make_train_step(self.model, mesh=step_mesh)
        self.eval_step = make_eval_step(self.model, mesh=step_mesh)
        self.ckpt = CheckpointManager(self.model_dir, cfg.train.max_to_keep)
        # Multi-host: every process runs the identical compute (collectives
        # need all participants, checkpoint saves are collective), but only
        # process 0 writes logs/TB events/JPEG dumps — they all share one
        # filesystem view of the run dir.
        self.is_main_process = jax.process_index() == 0
        self._metrics_log = open(
            os.path.join(self.logs_dir, "metrics.jsonl"), "a"
        ) if self.is_main_process else None
        # TensorBoard scalar events alongside metrics.jsonl (the reference's
        # tf.summary FileWriter surface, reference train.py:164,176-177);
        # dependency-free writer, see train/tb_events.py
        from sap3d_tpu.train.tb_events import EventWriter

        self._tb = EventWriter(self.logs_dir) if self.is_main_process else None

        if cfg.train.pretrain:
            pre_dir = os.path.join(cfg.train.model_dir, cfg.train.pretrain)
            self.state, ok = try_restore_latest(self.state, pre_dir)
            print(f"pretrain restore from {pre_dir}: {'ok' if ok else 'MISSING'}")

    # -- logging helpers ---------------------------------------------------

    def _log(self, record: dict) -> None:
        if self._metrics_log is None:  # non-main process
            return
        record["time"] = datetime.datetime.now().isoformat(timespec="seconds")
        self._metrics_log.write(json.dumps(record) + "\n")
        self._metrics_log.flush()
        if "step" in record:
            self._tb.scalars(record, record["step"])
            self._tb.flush()

    @staticmethod
    def _local_block(arr) -> np.ndarray:
        """Materialize the process-local rows of a (possibly multi-host
        batch-sharded) array, in local batch order.  On a multi-host mesh a
        global array spans non-addressable devices and np.asarray raises;
        the local shards are exactly this host's loader rows."""
        if arr.is_fully_addressable:
            return np.asarray(arr)
        shards = sorted(
            arr.addressable_shards,
            key=lambda s: (s.index[0].start or 0) if s.index else 0,
        )
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

    def _dump_images(self, step: int, pred_last: np.ndarray, gt_last: np.ndarray):
        """pred/GT last-frame JPEG pairs (reference train.py:227-239)."""
        if cv2 is None or not self.is_main_process:
            return
        d = os.path.join(self.logs_dir, "smap_Result")
        os.makedirs(d, exist_ok=True)
        to_u8 = lambda m: np.clip(m * 255.0, 0, 255).astype(np.uint8)  # noqa: E731
        cv2.imwrite(os.path.join(d, f"step_{step}_pred.jpg"), to_u8(pred_last))
        cv2.imwrite(os.path.join(d, f"step_{step}_gt.jpg"), to_u8(gt_last))

    # -- main loop ---------------------------------------------------------

    def _macro_batches(self, it: Iterable):
        """Group K consecutive loader batches for the fused multi-step path."""
        if self.steps_per_call == 1:
            for f, t in it:
                yield 1, f, t
            return
        buf: list = []
        for f, t in it:
            buf.append((f, t))
            if len(buf) == self.steps_per_call:
                yield (
                    len(buf),
                    np.stack([b[0] for b in buf]),
                    np.stack([b[1] for b in buf]),
                )
                buf = []
        # remainder batches run through the single-step path
        for f, t in buf:
            yield 1, f, t

    def _prepare(self, item):
        """Host batch -> device arrays (sharded put) + host-side leftovers.

        The NumPy batch goes straight into the sharded device_put — an
        intermediate jnp.asarray would stage the whole batch on device 0
        first and pay an extra device-to-device scatter (and, multi-host, a
        D2H round trip inside make_array_from_process_local_data)."""
        k, frames, targets = item
        f, t = self._put((frames, targets), macro=(k > 1))
        n_clips = frames.shape[0] * (frames.shape[1] if k > 1 else 1)
        return k, f, t, targets, n_clips

    def _put(self, batch, macro: bool = False):
        """Sharded device_put: batch axis on the data mesh, or time axis on
        the time mesh in long-clip mode."""
        if self.time_mesh is not None:
            return mesh_lib.time_shard_batch(self.time_mesh, batch,
                                             macro=macro)
        return mesh_lib.shard_batch(self.mesh, batch, macro=macro)

    def _device_prefetch(self, it: Iterable, depth: int = 1):
        """Double-buffer host->device transfers.

        The H2D put of macro-batch N+1 runs on a dedicated thread while the
        main thread dispatches/executes step N, so transfer overlaps device
        compute even when device_put is synchronous on this runtime (the
        tunnel-latency analogue of the reference's PrefetchDataZMQ,
        reference train.py:106)."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(1, thread_name_prefix="h2d-prefetch") as ex:
            q: deque = deque()
            for item in it:
                q.append(ex.submit(self._prepare, item))
                if len(q) > depth:
                    yield q.popleft().result()
            while q:
                yield q.popleft().result()

    def fit(self, train_batches: Iterable, valid_batches_fn=None) -> None:
        cfg = self.cfg.train
        rng = jax.random.PRNGKey(cfg.seed + 1)
        step = int(self.state.step)
        t_last, n_last = time.time(), 0
        profiling = False
        ran_any = False
        batches = self._device_prefetch(self._macro_batches(train_batches))
        for k, f, t, targets, n_clips in batches:
            step += k
            ran_any = True
            if cfg.profile_dir and step >= cfg.profile_start and not profiling \
                    and step < cfg.profile_start + cfg.profile_steps:
                jax.profiler.start_trace(cfg.profile_dir)
                profiling = True
            elif profiling and step >= cfg.profile_start + cfg.profile_steps:
                jax.block_until_ready(self.state.params)
                jax.profiler.stop_trace()
                profiling = False
            rng, drop_rng = jax.random.split(rng)
            if k == 1:
                self.state, loss = self.train_step(self.state, f, t, drop_rng)
            else:
                self.state, losses = self.multi_step(self.state, f, t, drop_rng)
                loss = losses[-1]
                f = f[-1]  # last micro-batch, for the side-dump below
                targets = targets[-1]
            n_last += n_clips

            if step < 10 + k or step % self.cfg.train.plot_iter < k:
                loss_v = float(loss)  # replicated -> addressable on any host
                dt = time.time() - t_last
                cps = n_last / dt if dt > 0 else 0.0
                pred = self._local_block(self.eval_step(self.state, f))
                self._dump_images(step, pred[0, -1], np.asarray(targets)[0, -1])
                print(
                    f"[{datetime.datetime.now().isoformat(timespec='seconds')}] "
                    f"step {step} loss {loss_v:.4f} clips/s {cps:.2f}"
                )
                self._log({"step": step, "loss": loss_v, "clips_per_sec": cps})
                t_last, n_last = time.time(), 0

            if (valid_batches_fn is not None and step >= cfg.valid_iter
                    and step % cfg.valid_iter < k):
                self.validate(step, valid_batches_fn())
                if self.is_main_process:
                    # 4-pane curve figure (GN trainer parity, reference
                    # gn/train_p3d_gn_dataset.py:294-310).
                    from sap3d_tpu.train.plotting import plot_curves

                    plot_curves(self.logs_dir)

            if step >= cfg.save_iter and step % cfg.save_iter < k:
                t_save = time.time()
                self.ckpt.save(self.state, step)  # async: returns post-snapshot
                self._log({"step": step,
                           "save_dispatch_s": time.time() - t_save})

            if cfg.max_steps is not None and step >= cfg.max_steps:
                break
        if profiling:
            jax.block_until_ready(self.state.params)
            jax.profiler.stop_trace()
        if not ran_any:
            if step == 0:
                # zero batches survived the train/valid split +
                # drop-remainder (e.g. clips < global batch).  Fail loudly:
                # saving the never-stepped init state would otherwise crash
                # deep inside the collective Orbax save on multi-host
                # (host-local init arrays).
                raise RuntimeError(
                    "fit() ran ZERO training steps — the loader produced no "
                    "full batches (too few clips for the batch size after "
                    "the train/valid split?).  Nothing was saved."
                )
            # resumed at step N with no new data: the checkpoint already
            # exists; a redundant save of the restored state adds nothing
            print(f"fit(): no new batches at step {step}; nothing to do")
        else:
            self.ckpt.save(self.state, step)
        print("Training Finished!")

    def validate(self, step: int, valid_batches: Iterable) -> dict:
        """CC/SIM/KLD/AUC-Judd fully on device, last frame per clip,
        NaN-filtered means (reference train.py:243-264).  AUC-Judd runs the
        batched static-shape sweep (eval/metrics_jax.py:auc_judd) instead of
        the reference's per-frame host loop; jitter uses a per-batch JAX key
        (same role as the host rng)."""
        ccs, sims, klds, aucs = [], [], [], []
        jitter_key = jax.random.PRNGKey(step)
        for bi, (frames, targets) in enumerate(valid_batches):
            f = self._put(np.asarray(frames))
            # local rows only: on a multi-host mesh the global pred spans
            # non-addressable devices; each host scores its own loader rows
            # and the lists are all-gathered below.  The time axis is sliced
            # ON DEVICE before fetching — only the last frame crosses D2H
            # (the full [B,T,H,W] fetch is 16x the bytes; cf. the predictor's
            # device-side last-frame slicing, infer/predictor.py)
            pred_last = jnp.asarray(
                self._local_block(self.eval_step(self.state, f)[:, -1])
            )  # [B_local, H, W]
            gt_last = jnp.asarray(targets)[:, -1]
            ccs += list(np.asarray(metrics_jax.cc(pred_last, gt_last)))
            sims += list(np.asarray(metrics_jax.sim(pred_last, gt_last)))
            klds += list(np.asarray(metrics_jax.kldiv(pred_last, gt_last)))
            # density-map targets are dense: sweep the full pixel count
            # (the default fixation cap is sized for sparse fixation maps)
            aucs += list(np.asarray(metrics_jax.auc_judd(
                pred_last, gt_last, jax.random.fold_in(jitter_key, bi),
                fix_cap=gt_last.shape[-2] * gt_last.shape[-1],
            )))
        if jax.process_count() > 1:
            # every host scored a disjoint clip subset of equal size; gather
            # so the reported means cover the full validation set
            from jax.experimental import multihost_utils

            ccs, sims, klds, aucs = (
                list(np.asarray(
                    multihost_utils.process_allgather(np.asarray(v))
                ).ravel())
                for v in (ccs, sims, klds, aucs)
            )
        result = {
            "step": step,
            "cc": host_metrics.nan_filtered_mean(ccs),
            "sim": host_metrics.nan_filtered_mean(sims),
            "kld": host_metrics.nan_filtered_mean(klds),
            "auc_judd": host_metrics.nan_filtered_mean(aucs),
            # implementation tag: the device sweep (float32, 1e-4 jitter,
            # full-pixel cap) scores match the host float64 sweep only in
            # distribution — curve comparisons against pre-r03 runs (which
            # logged the host implementation) should not be read as model
            # changes.  See PARITY.md §2.7.
            "auc_impl": "device_sweep_v1",
        }
        print(
            f"[valid] step {step} CC {result['cc']:.4f} SIM {result['sim']:.4f} "
            f"KLD {result['kld']:.4f} AUC_Judd {result['auc_judd']:.4f}"
        )
        self._log(result)
        return result

    def close(self):
        self.ckpt.close()
        if self._metrics_log is not None:
            self._metrics_log.close()
        if self._tb is not None:
            self._tb.close()
