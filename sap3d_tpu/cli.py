"""Command-line interface: train / eval / predict / make-video.

Maps the reference's four entry points onto subcommands:
  train      <- reference train.py + gn/train_p3d_gn_dataset.py
  eval       <- reference test.py
  predict    <- reference gen_pred.py
  make-video <- reference gen_video.py
  eval-dirs  <- reference utils/matlab_metric/eval_vid.py (no MATLAB)

Flag names mirror the reference argparse surface (reference train.py:21-45)
with the bool-parsing quirk fixed (core/config.py).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

import numpy as np

from sap3d_tpu.core.config import (
    DATASET_ROOTS,
    Config,
    DataConfig,
    ModelConfig,
    TrainConfig,
    parse_bool,
)


def _add_common_model_flags(p: argparse.ArgumentParser, dtype: str = "bfloat16"):
    p.add_argument("--structure", type=str, default="unet++",
                   help="model name or alias (unet/concat/unet++/P3D_SA_CONCAT/...)")
    p.add_argument("--dtype", type=str, default=dtype,
                   help=f"compute dtype: bfloat16/float32 (default {dtype})")
    p.add_argument("--normalization", type=str, default=None,
                   help="ignored; BN/GN is keyed by the model variant "
                        "(kept for reference CLI compat)")
    p.add_argument("--SA", type=parse_bool, default=True,
                   help="kept for reference CLI compat (variant-keyed)")


def _add_data_flags(p: argparse.ArgumentParser):
    p.add_argument("--dataset", type=str, default=None,
                   help="named dataset (svsd/dhf1k/svsdndhf1k)")
    p.add_argument("--frames", type=str, nargs="*", default=None,
                   help="frame root dirs (override --dataset)")
    p.add_argument("--densities", type=str, nargs="*", default=None)
    p.add_argument("--fixations", type=str, default=None)
    p.add_argument("--videolength", type=int, default=16)
    p.add_argument("--overlap", type=int, default=15)
    p.add_argument("--trainingprops", type=float, default=0.9)
    p.add_argument("--imagesize", type=int, default=112)
    p.add_argument("--threads", type=int, default=16)


def _data_config(args) -> DataConfig:
    frame_dirs, density_dirs, fixation_dir = args.frames, args.densities, args.fixations
    if args.dataset:
        roots = DATASET_ROOTS[args.dataset]
        frame_dirs = frame_dirs or roots["frame_dirs"]
        density_dirs = density_dirs or roots["density_dirs"]
        fixation_dir = fixation_dir or roots.get("fixation_dir")
    return DataConfig(
        frame_dirs=frame_dirs or (),
        density_dirs=density_dirs or (),
        fixation_dir=fixation_dir,
        video_length=args.videolength,
        overlap=args.overlap,
        training_props=args.trainingprops,
        image_size=args.imagesize,
        num_threads=args.threads,
    )


def cmd_train(argv) -> int:
    p = argparse.ArgumentParser(prog="sap3d train")
    _add_common_model_flags(p)
    _add_data_flags(p)
    p.add_argument("--plotiter", type=int, default=1000)
    p.add_argument("--validiter", type=int, default=160000)
    p.add_argument("--saveiter", type=int, default=4000)
    p.add_argument("--pretrain", type=str, default=None)
    p.add_argument("--epoch", type=int, default=4)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--info", type=str, default="")
    p.add_argument("--devices", type=int, default=-1)
    p.add_argument("--sync-bn", type=parse_bool, default=False)
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="train steps fused per device dispatch (4 recommended)")
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--distributed", type=parse_bool, default=False,
                   help="multi-host: run jax.distributed.initialize() so the "
                        "mesh spans all hosts; --batch is the GLOBAL batch")
    p.add_argument("--coordinator", type=str, default=None,
                   help="multi-host coordinator address host:port (omit on "
                        "TPU pods: auto-detected)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--dropout", type=float, default=0.5,
                   help="decoder dropout rate (reference train.py:218 feeds "
                        "0.5; 0 disables)")
    p.add_argument("--shuffle", type=parse_bool, default=True,
                   help="per-epoch clip shuffle; false = the reference's "
                        "dataflow_list.py no-shuffle variant")
    p.add_argument("--time-shards", type=int, default=0,
                   help="long-clip sequence parallelism: shard the clip "
                        "TIME axis over N devices (requires --videolength "
                        "to be a multiple of 16*N; single-process; replaces "
                        "data parallelism)")
    p.add_argument("--ring-attention", type=parse_bool, default=True,
                   help="with --time-shards on an SA variant: ring "
                        "attention across shards instead of all-gather")
    args = p.parse_args(argv)

    import jax

    from sap3d_tpu.core.mesh import initialize_distributed
    from sap3d_tpu.data.indexer import ClipIndex
    from sap3d_tpu.data.pipeline import ClipLoader
    from sap3d_tpu.train.trainer import Trainer

    if args.distributed:
        dist_kw = {}
        if args.coordinator:
            dist_kw = dict(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id,
            )
        elif args.num_processes is not None or args.process_id is not None:
            # without a coordinator these flags would be silently dropped
            # and both launched processes would train independently
            p.error("--num-processes/--process-id require --coordinator")
        initialize_distributed(**dist_kw)
    proc_idx, proc_cnt = jax.process_index(), jax.process_count()
    if args.batch % proc_cnt != 0:
        print(f"--batch {args.batch} must divide by process_count {proc_cnt}",
              file=sys.stderr)
        return 2
    host_batch = args.batch // proc_cnt

    cfg = Config(
        model=ModelConfig(name=args.structure, dtype=args.dtype,
                          dropout=args.dropout),
        data=_data_config(args),
        train=TrainConfig(
            batch_size=args.batch, lr=args.lr, epochs=args.epoch,
            plot_iter=args.plotiter, valid_iter=args.validiter,
            save_iter=args.saveiter, pretrain=args.pretrain,
            num_devices=args.devices, info=args.info, sync_bn=args.sync_bn,
            steps_per_call=args.steps_per_call,
            weight_decay=args.weight_decay, max_steps=args.max_steps,
            time_shards=args.time_shards,
            ring_attention=args.ring_attention,
        ),
    )
    idx = ClipIndex(
        cfg.data.frame_dirs, cfg.data.density_dirs,
        fixation_dir=cfg.data.fixation_dir,
        video_length=cfg.data.video_length,
    ).setup(
        overlap=cfg.data.overlap, training_props=cfg.data.training_props,
        skip_head=cfg.data.skip_head, seed=cfg.data.shuffle_seed,
    )
    print(idx.summary())
    if not idx.train_clips():
        # otherwise a misconfigured launch "trains" on zero batches and
        # writes a plausible-looking run dir holding random weights
        print("no training clips found — check --dataset/--frames/"
              "--densities", file=sys.stderr)
        return 2
    n_dev = jax.device_count() if args.devices in (-1, 0) else args.devices
    if args.time_shards > 1:
        n_dev = 1  # time mode: the data mesh is a single device group
    if args.batch % max(n_dev, 1) != 0:
        print(f"--batch {args.batch} must divide by the data-parallel mesh "
              f"size {n_dev} (use --devices to shrink the mesh)",
              file=sys.stderr)
        return 2
    trainer = Trainer(cfg)
    train_loader = ClipLoader(
        idx.train_clips(), host_batch, size=cfg.data.image_size,
        num_threads=cfg.data.num_threads, epochs=cfg.train.epochs,
        cache_frames=cfg.data.cache_frames, shuffle=args.shuffle,
        process_index=proc_idx, process_count=proc_cnt,
    )
    valid_fn = lambda: ClipLoader(  # noqa: E731
        idx.valid_clips(), host_batch, size=cfg.data.image_size,
        num_threads=cfg.data.num_threads, shuffle=False,
        process_index=proc_idx, process_count=proc_cnt,
    )
    with train_loader:
        trainer.fit(iter(train_loader), valid_fn)
    trainer.close()
    return 0


def infer_structure_from_run_name(run_name: str) -> str | None:
    """Best-effort model-variant inference from a run-dir name.

    The reference parses the structure out of each modelList entry
    (reference test.py:129-136); run dirs here are named
    ``<model>_<batch>_<lr>_<info>_<date>`` (train/trainer.py run_name), so
    the longest registry name or alias that prefixes the basename wins.
    """
    from sap3d_tpu.models.registry import MODEL_REGISTRY, STRUCTURE_ALIASES

    base = os.path.basename(run_name.rstrip("/"))
    candidates = sorted(
        list(MODEL_REGISTRY) + list(STRUCTURE_ALIASES), key=len, reverse=True
    )
    for cand in candidates:
        if base == cand or base.startswith(cand + "_"):
            return cand
    return None


def cmd_eval(argv) -> int:
    p = argparse.ArgumentParser(prog="sap3d eval")
    # float32 default: the reference evaluates in fp32 (TF1 default dtype),
    # so parity metric comparisons must not silently run at reduced precision.
    _add_common_model_flags(p, dtype="float32")
    _add_data_flags(p)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--checkpoint", type=str, nargs="+", default=[],
                   help="run directory name(s) under --model-dir; globs "
                        "allowed — every match is evaluated in one invocation"
                        " (reference test.py's modelList sweep)")
    p.add_argument("--model-dir", type=str, default="./model")
    p.add_argument("--tf-checkpoint", type=str, default=None,
                   help="evaluate a reference TF1 checkpoint directly "
                        "(interop/tf_import.py); variant from --structure")
    p.add_argument("--bn-quirk", action="store_true",
                   help="reference-faithful inference: bottleneck BNs use "
                        "batch statistics (the reference never forwards its "
                        "training flag into make_block, p3d.py:290-303); "
                        "implied by --tf-checkpoint")
    p.add_argument("--devices", type=int, default=-1,
                   help="evaluate data-parallel over this many devices "
                        "(-1 = all local); --batch must divide by it")
    args = p.parse_args(argv)
    if not args.checkpoint and not args.tf_checkpoint:
        p.error("one of --checkpoint / --tf-checkpoint is required")

    import glob as globlib

    import jax

    from sap3d_tpu.data.indexer import ClipIndex
    from sap3d_tpu.data.pipeline import ClipLoader
    from sap3d_tpu.eval.evaluator import evaluate_prediction_batches
    from sap3d_tpu.models.registry import build_model, resolve_name
    from sap3d_tpu.train.checkpoint import try_restore_latest
    from sap3d_tpu.train.state import create_train_state
    from sap3d_tpu.train.steps import make_eval_step

    data = _data_config(args)
    if not data.fixation_dir:
        # eval computes NSS/AUC against fixation maps (reference
        # test.py:173-175); named DATASET_ROOTS entries carry densities only
        p.error("eval needs fixation maps: pass --fixations <dir> "
                "(NSS/AUC-Judd/AUC-Borji are fixation-based)")
    idx = ClipIndex(
        data.frame_dirs, data.density_dirs, fixation_dir=data.fixation_dir,
        video_length=data.video_length,
    ).setup(overlap=data.overlap, training_props=0.0, skip_head=data.skip_head)
    print(idx.summary())

    # expand the model list (reference test.py:106-128 hard-codes modelList;
    # here it is --checkpoint names/globs)
    runs: list[str] = []
    for pat in args.checkpoint:
        matches = sorted(globlib.glob(os.path.join(args.model_dir, pat)))
        if matches:
            runs += [os.path.basename(m) for m in matches if os.path.isdir(m)]
        else:
            runs.append(pat)
    seen: set[str] = set()
    runs = [r for r in runs if not (r in seen or seen.add(r))]

    input_shape = (args.batch, data.video_length, data.image_size,
                   data.image_size, 3)
    results: dict[str, dict] = {}
    failures = 0

    if args.tf_checkpoint:
        # reference-TF1-checkpoint workflow (reference test.py:138-154):
        # import the Saver checkpoint and evaluate it with the reference's
        # exact inference semantics (bottleneck BNs on batch statistics).
        structure = resolve_name(args.structure)
        model, state = _state_from_tf_checkpoint(
            structure, args.tf_checkpoint, args.dtype, input_shape
        )
        runs.insert(0, ("tf:" + args.tf_checkpoint, structure, model, state))

    for run in runs:
        if isinstance(run, tuple):  # pre-loaded TF-import entry
            run, structure, model, state = run
        else:
            structure = infer_structure_from_run_name(run) or args.structure
            model = build_model(
                resolve_name(structure), dtype=args.dtype,
                bn_reference_quirk=args.bn_quirk,
            )
            state = create_train_state(
                model, jax.random.PRNGKey(0), input_shape=input_shape
            )
            state, ok = try_restore_latest(
                state, os.path.join(args.model_dir, run)
            )
            if not ok:
                print(f"no checkpoint found under {args.model_dir}/{run}",
                      file=sys.stderr)
                failures += 1
                continue
        # mesh-sharded eval: a multi-chip host scores batches data-parallel
        # (the reference's device-bound eval loop, test.py:160, scaled)
        from sap3d_tpu.core import mesh as mesh_lib

        mesh = mesh_lib.make_mesh(args.devices)
        n_dev = mesh.devices.size
        if args.batch % n_dev == 0 and n_dev > 1:
            ev = make_eval_step(model, mesh=mesh)
            put = lambda f: mesh_lib.shard_batch(mesh, jax.numpy.asarray(f))  # noqa: E731
        else:
            if n_dev > 1:
                print(
                    f"[eval] --batch {args.batch} does not divide by "
                    f"{n_dev} devices; falling back to SINGLE-device eval",
                    file=sys.stderr,
                )
            ev = make_eval_step(model)
            put = jax.numpy.asarray
        loader = ClipLoader(
            idx.valid_clips(with_fixations=True), args.batch,
            size=data.image_size, num_threads=data.num_threads, shuffle=False,
            test_mode=True,
        )
        with loader:
            result = evaluate_prediction_batches(
                iter(loader), lambda f: ev(state, put(f))
            )
        results[run] = result
        print(
            f"Model: {run} (structure {structure})\n"
            f" All: {result['n']}, Metrics: CC: {result['cc']:.3f}  "
            f"SIM: {result['sim']:.3f}   NSS: {result['nss']:.3f}  "
            f"AUC_Judd: {result['auc_judd']:.3f}   "
            f"AUC_Borji: {result['auc_borji']:.3f}"
            f"   (compute dtype: {args.dtype})"
        )
    if len(results) > 1:
        print("\nmodel                                    CC     SIM    NSS    "
              "AUC_J  AUC_B")
        for run, r in results.items():
            print(f"{run:<40} {r['cc']:.3f}  {r['sim']:.3f}  {r['nss']:.3f}  "
                  f"{r['auc_judd']:.3f}  {r['auc_borji']:.3f}")
    return 0 if results and not failures else 1


def _state_from_tf_checkpoint(structure: str, ckpt_path: str, dtype,
                              input_shape):
    """Build a (model, state) pair from a reference TF1 Saver checkpoint with
    reference-faithful inference semantics (interop/tf_import.py)."""
    import jax

    from sap3d_tpu.interop.tf_import import (
        import_checkpoint,
        validate_against_model,
    )
    from sap3d_tpu.models.registry import build_model
    from sap3d_tpu.train.state import create_train_state

    model = build_model(structure, dtype=dtype, bn_reference_quirk=True)
    state = create_train_state(
        model, jax.random.PRNGKey(0), input_shape=input_shape
    )
    variables = import_checkpoint(structure, ckpt_path)
    validate_against_model(variables, model, input_shape)
    # map_tf_variables always emits a 'batch_stats' key (possibly {});
    # keep the freshly-initialized stats for GN models rather than
    # silently replacing them with {}.
    return model, state.replace(
        params=variables["params"],
        batch_stats=variables["batch_stats"] or state.batch_stats,
    )


def cmd_predict(argv) -> int:
    p = argparse.ArgumentParser(prog="sap3d predict")
    _add_common_model_flags(p)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--model-dir", type=str, default="./model")
    p.add_argument("--tf-checkpoint", type=str, default=None,
                   help="run inference from a reference TF1 checkpoint "
                        "(the reference gen_pred.py workflow, "
                        "gen_pred.py:56-64); variant from --structure")
    p.add_argument("--data", type=str, required=True, help="video frames root")
    p.add_argument("--out", type=str, required=True, help="output root")
    p.add_argument("--batch-windows", type=int, default=16,
                   help="windows per device step (16 = measured v5e saturation"
                        " knee, BASELINE.md)")
    p.add_argument("--imagesize", type=int, default=112,
                   help="network input resolution (the reference gen_pred.py "
                        "hardcodes 112, gen_pred.py:119)")
    args = p.parse_args(argv)
    if (args.checkpoint is None) == (args.tf_checkpoint is None):
        p.error("exactly one of --checkpoint / --tf-checkpoint is required")

    import os

    import jax

    from sap3d_tpu.infer.predictor import SlidingWindowPredictor
    from sap3d_tpu.models.registry import build_model, resolve_name
    from sap3d_tpu.train.checkpoint import try_restore_latest
    from sap3d_tpu.train.state import create_train_state
    from sap3d_tpu.train.steps import make_eval_step

    input_shape = (args.batch_windows, 16, args.imagesize, args.imagesize, 3)
    if args.tf_checkpoint:
        model, state = _state_from_tf_checkpoint(
            resolve_name(args.structure), args.tf_checkpoint, args.dtype,
            input_shape,
        )
    else:
        model = build_model(resolve_name(args.structure), dtype=args.dtype)
        state = create_train_state(
            model, jax.random.PRNGKey(0), input_shape=input_shape
        )
        state, ok = try_restore_latest(
            state, os.path.join(args.model_dir, args.checkpoint)
        )
        if not ok:
            print("checkpoint missing", file=sys.stderr)
            return 1
    ev = make_eval_step(model)
    pred = SlidingWindowPredictor(
        lambda clips: ev(state, clips), batch_windows=args.batch_windows,
        image_size=args.imagesize,
    )
    n = pred.export_dataset(args.data, args.out)
    print(f"exported {n} videos")
    return 0


def cmd_make_video(argv) -> int:
    p = argparse.ArgumentParser(prog="sap3d make-video")
    p.add_argument("--results", type=str, required=True)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--fps", type=float, default=25.0)
    args = p.parse_args(argv)
    from sap3d_tpu.infer.video import export_all_videos

    n = export_all_videos(args.results, args.out, fps=args.fps)
    print(f"wrote {n} videos")
    return 0


def cmd_eval_dirs(argv) -> int:
    p = argparse.ArgumentParser(prog="sap3d eval-dirs")
    p.add_argument("--dsname", type=str, default=None,
                   help="named dataset (videoset/msu/ledov/hollywood/dhf1k/"
                        "diem/gazecom/coutort2/svsd — reference "
                        "eval_vid.py:22-61); resolves --pred/--density/"
                        "--fixation; roots under $SAP3D_DATA_ROOT")
    p.add_argument("--pred", type=str, default=None)
    p.add_argument("--density", type=str, default=None)
    p.add_argument("--fixation", type=str, default=None)
    p.add_argument("--metrics", type=str, nargs="*",
                   default=["cc", "sim", "auc_judd"],
                   choices=["cc", "sim", "kldiv", "nss", "auc_judd",
                            "auc_borji", "auc_shuffled"],
                   help="auc_shuffled/auc_borji/nss need --fixation")
    p.add_argument("--workers", type=int, default=None,
                   help="videos scored concurrently (default: min(8, cpus); "
                        "replaces the reference's MATLAB parpool(5), "
                        "metric_video_base.m:1-20)")
    p.add_argument("--device", type=parse_bool, default=False,
                   help="score on the accelerator: one jitted batch "
                        "reduction per frame chunk instead of per-frame "
                        "NumPy loops")
    args = p.parse_args(argv)
    if args.dsname:
        from sap3d_tpu.core.config import EVAL_DATASETS

        if args.dsname not in EVAL_DATASETS:
            print(f"unknown dsname {args.dsname!r}; known: "
                  f"{sorted(EVAL_DATASETS)}", file=sys.stderr)
            return 2
        ds = EVAL_DATASETS[args.dsname]
        args.pred = args.pred or ds["saliency_dir"]
        args.density = args.density or ds["density_dir"]
        args.fixation = args.fixation or ds["fixation_dir"]
    if not args.pred or not args.density:
        print("--pred and --density are required (or use --dsname)",
              file=sys.stderr)
        return 2
    from sap3d_tpu.eval.evaluator import evaluate_saliency_dirs

    results = evaluate_saliency_dirs(
        args.pred, args.density, args.fixation, tuple(args.metrics),
        workers=args.workers, device=args.device,
    )
    for video, scores in results.items():
        line = "  ".join(f"{k}: {v:.4f}" for k, v in scores.items())
        print(f"{video}: {line}")
    if results:
        for m in args.metrics:
            vals = [s[m] for s in results.values() if m in s]
            if vals:
                print(f"MEAN {m}: {float(np.nanmean(vals)):.4f}")
    return 0


def cmd_inspect(argv) -> int:
    """Checkpoint variable inspector (reference utils/test_model.py parity)."""
    from sap3d_tpu.train.inspect_ckpt import main as inspect_main

    return inspect_main(argv)


def cmd_plot(argv) -> int:
    """Regenerate the 4-pane training-curve figure from a run's logs."""
    p = argparse.ArgumentParser(prog="sap3d plot")
    p.add_argument("logs_dir", type=str)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)
    from sap3d_tpu.train.plotting import plot_curves

    out = plot_curves(args.logs_dir, args.out)
    print(out or "matplotlib unavailable")
    return 0


COMMANDS = {
    "train": cmd_train,
    "eval": cmd_eval,
    "predict": cmd_predict,
    "make-video": cmd_make_video,
    "eval-dirs": cmd_eval_dirs,
    "inspect": cmd_inspect,
    "plot": cmd_plot,
}


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in COMMANDS:
        print(f"usage: sap3d {{{','.join(COMMANDS)}}} [args]", file=sys.stderr)
        return 2
    return COMMANDS[argv[0]](argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
