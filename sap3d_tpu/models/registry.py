"""Model registry: every reference model name -> a P3DSaliency configuration.

BN family (reference p3d.py) and GN+CBAM family (reference gn/p3d_gn.py),
12 variants total.  ``build_model(name, ...)`` constructs the flax module.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from sap3d_tpu.models.p3d import P3DSaliency

# name -> (decoder, decoder_kwargs, norm_mode, backbone_cbam)
MODEL_REGISTRY: dict[str, dict[str, Any]] = {
    # ---- BN family (reference p3d.py) ----
    "p3d_unet": dict(decoder="unet", norm_mode="bn"),
    "p3d_concat": dict(decoder="concat", norm_mode="bn"),
    "p3d_unetplusplus": dict(
        decoder="unetpp",
        decoder_kwargs=dict(attention="sa", head="full"),
        norm_mode="bn",
    ),
    "p3d_unetplusplus_ds": dict(
        decoder="unetpp",
        decoder_kwargs=dict(attention="sa", head="ds"),
        norm_mode="bn",
    ),
    "p3d_unetplusplus_nonsa": dict(
        decoder="unetpp",
        decoder_kwargs=dict(attention="none", head="ds"),
        norm_mode="bn",
    ),
    "p3d_unetplusplus_nl": dict(
        decoder="unetpp",
        decoder_kwargs=dict(attention="nl", head="ds"),
        norm_mode="bn",
    ),
    # ---- GN + CBAM family (reference gn/p3d_gn.py) ----
    "inference_p3d": dict(
        decoder="gn_easy",
        decoder_kwargs=dict(wide_pool4=True),
        norm_mode="gn",
        backbone_cbam=True,
    ),
    "inference_p3d_concat": dict(
        decoder="gn_easy",
        decoder_kwargs=dict(wide_pool4=False),
        norm_mode="gn",
        backbone_cbam=True,
    ),
    "inference_p3d_sa_concat": dict(
        decoder="gn_easy",
        decoder_kwargs=dict(wide_pool4=False, use_sa=True),
        norm_mode="gn",
        backbone_cbam=True,
    ),
    "inference_p3d_sa_concat_2": dict(
        decoder="gn_sa_concat_2",
        norm_mode="gn",
        backbone_cbam=True,
    ),
    "inference_p3d_sa_decoder_block": dict(
        decoder="gn_decoder_block",
        decoder_kwargs=dict(use_sa=True),
        norm_mode="gn",
        backbone_cbam=True,
    ),
    "inference_p3d_decoder_block": dict(
        decoder="gn_decoder_block",
        decoder_kwargs=dict(use_sa=False),
        norm_mode="gn",
        backbone_cbam=True,
    ),
    # ---- debug/CI scale (NOT a reference variant): the flagship topology
    # at ~1/1000 the parameters, for multi-process CPU tests and smoke runs
    "p3d_micro": dict(
        decoder="unetpp",
        decoder_kwargs=dict(attention="none", head="ds"),
        norm_mode="bn",
        stages=((4, 1), (4, 1), (4, 1)),
        stem_features=4,
    ),
    # the same, with the flagship's self-attention sites — exercises the
    # SA/ring code paths (incl. `cli train --time-shards`) at CI scale
    "p3d_micro_sa": dict(
        decoder="unetpp",
        decoder_kwargs=dict(attention="sa", head="ds"),
        norm_mode="bn",
        stages=((8, 1), (16, 1), (32, 1)),
        stem_features=8,
    ),
}

# The trainer CLI's --structure values (reference train.py:149-154).
STRUCTURE_ALIASES = {
    "unet": "p3d_unet",
    "concat": "p3d_concat",
    "unet++": "p3d_unetplusplus_ds",  # the runnable unet++ (SURVEY.md section 2.2)
    "unet++full": "p3d_unetplusplus",
    "unet++nonsa": "p3d_unetplusplus_nonsa",
    "unet++nl": "p3d_unetplusplus_nl",
    # GN trainer --net values (reference gn/train_p3d_gn_dataset.py:169-180).
    "P3D": "inference_p3d",
    "P3D_CONCAT": "inference_p3d_concat",
    "P3D_SA_CONCAT": "inference_p3d_sa_concat",
    "P3D_SA_CONCAT_2": "inference_p3d_sa_concat_2",
    "P3D_SA_DECODER": "inference_p3d_sa_decoder_block",
    "P3D_DECODER": "inference_p3d_decoder_block",
}

# Variants whose output is linear (no sigmoid) — callers that need a
# probability map should apply their own activation, as the reference does not.
LINEAR_OUTPUT = {
    "p3d_concat",
    "inference_p3d",
    "inference_p3d_concat",
    "inference_p3d_sa_concat",
    "inference_p3d_sa_concat_2",
    "inference_p3d_sa_decoder_block",
    "inference_p3d_decoder_block",
}


def resolve_name(name: str) -> str:
    if name in MODEL_REGISTRY:
        return name
    if name in STRUCTURE_ALIASES:
        return STRUCTURE_ALIASES[name]
    raise KeyError(
        f"unknown model {name!r}; known: {sorted(MODEL_REGISTRY)} "
        f"or aliases {sorted(STRUCTURE_ALIASES)}"
    )


def build_model(
    name: str,
    dtype: jnp.dtype | str | None = None,
    dropout_rate: float = 0.5,
    axis_name: str | None = None,
    bn_reference_quirk: bool = False,
    ring_mesh=None,
) -> P3DSaliency:
    """``bn_reference_quirk=True`` reproduces the reference's inference
    behavior exactly: bottleneck BNs normalize with batch statistics even at
    eval, because the reference never forwards its training flag into
    make_block/Bottleneck (reference p3d.py:141,148,290-303).  Needed for
    output parity with imported TF checkpoints; off by default.

    ``ring_mesh`` (a core/mesh.make_time_mesh mesh) turns the SA decoders'
    attention sites into shard_map rings for long-clip sequence parallelism
    (ops/ring_attention.py); params are identical with and without it."""
    cfg = dict(MODEL_REGISTRY[resolve_name(name)])
    if isinstance(dtype, str):
        dtype = None if dtype in ("float32", "f32") else jnp.dtype(dtype)
    return P3DSaliency(
        **cfg, dropout_rate=dropout_rate, dtype=dtype, axis_name=axis_name,
        bn_reference_quirk=bn_reference_quirk, ring_mesh=ring_mesh,
    )
