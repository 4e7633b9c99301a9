"""Configuration dataclasses for the whole framework.

The reference scatters its configuration across argparse flags in each entry
point (reference train.py:21-45, test.py:22-45, gn/train_p3d_gn_dataset.py:28-45)
plus hard-coded module constants (reference p3d.py:4-8) and dataset roots keyed
by a ``--dataset`` string (reference train.py:76-91).  Here everything lives in
typed dataclasses with CLI overrides; dataset roots are config, not code.

The reference's ``type=bool`` argparse quirk (any non-empty string parses True,
reference train.py:38) is fixed: boolean flags use explicit true/false parsing.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Sequence


# Module constants of the reference (reference p3d.py:4-8).
CROP_SIZE = 112
NUM_FRAMES_PER_CLIP = 16
RGB_CHANNEL = 3
BLOCK_EXPANSION = 4

# Per-channel RGB mean subtracted by the decode pipeline, already reversed to
# RGB order (reference dataflow.py:194-196: BGR mean [98,102,90] flipped).
RGB_MEAN = (90.0, 102.0, 98.0)


def parse_bool(v: Any) -> bool:
    """Strict bool parsing (fixes reference train.py:38's truthy-string quirk)."""
    if isinstance(v, bool):
        return v
    s = str(v).strip().lower()
    if s in ("1", "true", "t", "yes", "y"):
        return True
    if s in ("0", "false", "f", "no", "n"):
        return False
    raise ValueError(f"cannot parse boolean from {v!r}")


@dataclass(frozen=True)
class ModelConfig:
    """Which model variant to build and with what numerics."""

    # Registry name, e.g. "p3d_unetplusplus_ds" (see models/registry.py).
    name: str = "p3d_unetplusplus_ds"
    # Computation dtype. Params always live in float32; "bfloat16" runs the
    # convs/matmuls on the MXU at 2x throughput.
    dtype: str = "bfloat16"
    # Dropout rate fed at train time (reference train.py:218 uses 0.5).
    dropout: float = 0.5


@dataclass(frozen=True)
class DataConfig:
    """Clip indexing + decode pipeline settings (reference dataflow.py)."""

    frame_dirs: Sequence[str] = ()
    density_dirs: Sequence[str] = ()
    fixation_dir: str | None = None
    video_length: int = NUM_FRAMES_PER_CLIP
    # Stride between clip starts is video_length - overlap
    # (reference dataflow.py:43).
    overlap: int = 15
    # Frames skipped at the head of every video (reference dataflow.py:39).
    skip_head: int = 11
    # Train/valid split proportion (reference train.py:97 uses 0.9).
    training_props: float = 0.9
    image_size: int = CROP_SIZE
    # Decode worker threads (reference train.py:101 uses 32).
    num_threads: int = 16
    # Batches buffered ahead of the device (reference PrefetchDataZMQ analogue).
    prefetch: int = 4
    # LRU capacity (in frames) of the decoded-frame cache.  With overlap=15
    # indexing every JPEG is referenced ~16x per epoch; caching the
    # preprocessed floats removes the redundant decodes (~150KB/frame at 112).
    cache_frames: int = 8192
    shuffle_seed: int = 0
    # frame filename patterns (reference dataflow.py:72-74).
    frame_wildcard: str = "frame_%d.jpg"
    gt_wildcard: str = "frame_%d.jpg"
    fix_wildcard: str = "frame_%d.bmp"


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 2  # global batch (reference train.py:39)
    lr: float = 1e-4  # reference train.py:40
    epochs: int = 4  # reference train.py:30
    plot_iter: int = 1000  # reference train.py:24
    valid_iter: int = 160000  # reference train.py:25
    save_iter: int = 4000  # reference train.py:26
    max_to_keep: int = 10  # reference train.py:185
    seed: int = 0
    # Decoupled L2 weight decay (optax.adamw). 0 = parity: both reference
    # trainers build weight-decay terms but comment them out of the loss
    # (reference train.py:161-162, gn/train_p3d_gn_dataset.py:187-189).
    weight_decay: float = 0.0
    # Hard step cap (reference GN trainer's fixed training_iters stop,
    # gn/train_p3d_gn_dataset.py:235-241). None = run the loader dry.
    max_steps: int | None = None
    # Resume from latest checkpoint in this run dir (reference --pretrain).
    pretrain: str | None = None
    # Data-parallel mesh size; 1 = single chip. The reference has no DP at all
    # (reference train.sh runs 3 independent single-GPU processes).
    num_devices: int = -1  # -1 = use all local devices
    # Long-clip sequence parallelism: shard the clip's TIME axis over this
    # many devices (core/mesh.make_time_mesh).  0/1 = off.  Mutually
    # exclusive with data parallelism (the mesh is 1-D over time); the
    # reference fixes clips at 16 frames (SURVEY.md section 2.9) — this is
    # the long-context stretch goal's trainer surface.
    time_shards: int = 0
    # With time_shards > 1 on an SA variant: run the attention sites as
    # shard_map rings (ops/ring_attention.py) instead of GSPMD all-gathers.
    ring_attention: bool = True
    model_dir: str = "./model"
    logs_dir: str = "./logs"
    info: str = ""
    # Historical knob, now a documented no-op: under the jit+GSPMD trainer
    # the batch axis is sharded on the mesh, so BN's mean/var reductions are
    # ALWAYS global-batch (XLA inserts the collectives) — i.e. sync-BN is
    # structurally on.  TF1's per-replica stats (SURVEY.md section 7) do not
    # exist under GSPMD; the single-process reference ran one replica, where
    # global == per-replica, so parity is unaffected.
    sync_bn: bool = False
    # Train steps fused into one device dispatch via lax.scan (amortizes
    # host dispatch latency; +45% on the tunneled v5e, BASELINE.md). 1 =
    # reference-style per-step dispatch.
    steps_per_call: int = 1
    # NaN debugging (jax.config.debug_nans analogue, applied in trainer).
    debug_nans: bool = False
    # When set, capture a jax.profiler trace of steps [profile_start,
    # profile_start + profile_steps) into this directory.  (The reference has
    # no profiling at all — its timeline import is commented out, reference
    # gn/train_p3d_gn_dataset.py:21.)
    profile_dir: str | None = None
    profile_start: int = 10
    profile_steps: int = 5


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# Named dataset roots, mirroring reference train.py:76-91 / test.py:73-76 but
# overridable (they are config values, not code).
DATASET_ROOTS: dict[str, dict[str, Any]] = {
    "svsd": {
        "frame_dirs": ["/data/svsd/train/left_view_svsd/"],
        "density_dirs": ["/data/svsd/train/left_density_svsd/"],
        "fixation_dir": None,
    },
    "dhf1k": {
        "frame_dirs": ["/data/DHF1K/frames/"],
        "density_dirs": ["/data/DHF1K/density/"],
        "fixation_dir": None,
    },
    "svsdndhf1k": {
        "frame_dirs": ["/data/svsd/train/left_view_svsd/", "/data/DHF1K/frames/"],
        "density_dirs": ["/data/svsd/train/left_density_svsd/", "/data/DHF1K/density/"],
        "fixation_dir": None,
    },
}


def _eval_ds(density: str, saliency: str, fixation: str) -> dict[str, str]:
    return {"density_dir": density, "saliency_dir": saliency,
            "fixation_dir": fixation}


# Batch-scoring dataset map: the 9 --dsname values of the reference's MATLAB
# evaluator orchestrator (reference utils/matlab_metric/eval_vid.py:22-61),
# each resolving to (density, produced-saliency, fixation) roots.  The
# reference hard-codes absolute /data paths; here the common root is
# overridable via $SAP3D_DATA_ROOT (default "/data") so the map is config,
# not code.
_DR = os.environ.get("SAP3D_DATA_ROOT", "/data")
EVAL_DATASETS: dict[str, dict[str, str]] = {
    "videoset": _eval_ds(
        f"{_DR}/SaliencyDataset/Video/VideoSet/ImageSet/Seperate/density/sigma32",
        f"{_DR}/SaliencyDataset/Video/VideoSet/Results/saliency_map_1128",
        f"{_DR}/SaliencyDataset/Video/VideoSet/ImageSet/Seperate/fixation",
    ),
    "msu": _eval_ds(
        f"{_DR}/SaliencyDataset/Video/MSU/density/sigma32",
        f"{_DR}/SaliencyDataset/Video/MSU/saliency_map_1128",
        f"{_DR}/SaliencyDataset/Video/MSU/fixation/image",
    ),
    "ledov": _eval_ds(
        f"{_DR}/SaliencyDataset/Video/LEDOV/density/sigma32",
        f"{_DR}/SaliencyDataset/Video/LEDOV/saliency_map_1128",
        f"{_DR}/SaliencyDataset/Video/LEDOV/fixation",
    ),
    "hollywood": _eval_ds(
        f"{_DR}/SaliencyDataset/Video/ActionInTheEye/Hollywood2/density",
        f"{_DR}/SaliencyDataset/Video/ActionInTheEye/Hollywood2/saliency_map_1128",
        f"{_DR}/SaliencyDataset/Video/ActionInTheEye/Hollywood2/fixation",
    ),
    "dhf1k": _eval_ds(
        f"{_DR}/SaliencyDataset/Video/DHF1K/density",
        f"{_DR}/SaliencyDataset/Video/DHF1K/saliency_map_1128",
        f"{_DR}/SaliencyDataset/Video/DHF1K/fixation",
    ),
    "diem": _eval_ds(
        f"{_DR}/SaliencyDataset/Video/DIEM/density/sigma32",
        f"{_DR}/SaliencyDataset/Video/DIEM/saliency_map_1128",
        f"{_DR}/SaliencyDataset/Video/DIEM/fixation_map/image",
    ),
    "gazecom": _eval_ds(
        f"{_DR}/SaliencyDataset/Video/GAZECOM/density/sigma32",
        f"{_DR}/SaliencyDataset/Video/GAZECOM/saliency_map_1128",
        f"{_DR}/SaliencyDataset/Video/GAZECOM/fixations",
    ),
    "coutort2": _eval_ds(
        f"{_DR}/SaliencyDataset/Video/Coutort2/density/sigma32",
        f"{_DR}/SaliencyDataset/Video/Coutort2/saliency_map_1128",
        f"{_DR}/SaliencyDataset/Video/Coutort2/fixations",
    ),
    # the reference's svsd entry points its density at a DHF1K dir — kept
    # verbatim for parity (reference eval_vid.py:58-61)
    "svsd": _eval_ds(
        f"{_DR}/lishikai/svsd/DHF1K/density",
        f"{_DR}/SaliencyDataset/Video/DHF1K/saliency_map_1128",
        f"{_DR}/SaliencyDataset/Video/DHF1K/fixation",
    ),
}
