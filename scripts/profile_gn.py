"""GN+CBAM family on silicon: full-step ablations + train/infer throughput.

The round-4 verdict's gap #2: every bench through r4 was the BN flagship;
BASELINE.json configs 2-3 ("CBAM channel+spatial attention enabled in
backbone", "GroupNorm variant forward + backward") had no TPU numbers, and
the north-star names Pallas kernels for CBAM/GN *if* XLA measurably starves
there.  This instrument produces the deciding measurements:

  full_sa_decoder — inference_p3d_sa_decoder_block full train step
                    (GN norm, CBAM on all 47 bottlenecks, SA decoder;
                    reference gn/p3d_gn.py:428-539 + utils/cbam.py:51-128)
  no_cbam         — same model, backbone_cbam=False.  (full − no_cbam) =
                    CBAM's TRUE in-step cost across the 47 sites (the
                    part-D lesson: only full-step ablations decide).
  bn_backbone     — same decoder, norm_mode='bn': the GN↔BN normalization
                    swap's full-step delta (param count differs slightly;
                    conv/attention FLOPs identical).
  decoder_nosa    — inference_p3d_decoder_block (use_sa=False): the GN
                    decoder's SA-site cost.
  easy_full       — inference_p3d (GNEasyDecoder wide_pool4; reference
                    gn/p3d_gn.py:242-303).

Ablation legs use profile_step's chained N-differencing harness (b=16,
donated state).  All models are built at production config: bfloat16 +
the GN trainer's coupled L2 5e-4 on conv kernels (reference gn/p3d_gn.py:14).

Usage: python scripts/profile_gn.py [leg ...]   (default: all ablations)
"""

import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp  # noqa: E402

from sap3d_tpu.models.p3d import P3DSaliency  # noqa: E402
from sap3d_tpu.models.registry import MODEL_REGISTRY  # noqa: E402
from sap3d_tpu.train.state import create_train_state  # noqa: E402

from profile_step import (  # noqa: E402
    BATCH, SHAPE, chained_state, data, make_step,
)

GN_WD = 5e-4  # reference gn/p3d_gn.py:14-21 l2_reg on conv kernels


def build(name: str, **overrides) -> P3DSaliency:
    cfg = dict(MODEL_REGISTRY[name])
    cfg.update(overrides)
    return P3DSaliency(**cfg, dtype=jnp.bfloat16)


def timed_wd(name: str, model: P3DSaliency) -> float:
    frames, targets = data()
    state = create_train_state(
        model, jax.random.PRNGKey(0), input_shape=SHAPE, weight_decay=GN_WD
    )
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    ms = chained_state(make_step(model), state, frames, targets)
    print(
        f"{name:22s} {ms:8.2f} ms/step   {BATCH / ms * 1e3:6.1f} clips/s"
        f"   ({n_params / 1e6:.1f}M params)",
        flush=True,
    )
    return ms


LEGS = {
    "full_sa_decoder": lambda: build("inference_p3d_sa_decoder_block"),
    "no_cbam": lambda: build(
        "inference_p3d_sa_decoder_block", backbone_cbam=False
    ),
    "bn_backbone": lambda: build(
        "inference_p3d_sa_decoder_block", norm_mode="bn"
    ),
    "decoder_nosa": lambda: build("inference_p3d_decoder_block"),
    "easy_full": lambda: build("inference_p3d"),
}


def main():
    which = sys.argv[1:] or list(LEGS)
    for name in which:
        # one bad leg (compile OOM, config error) must not kill the rest
        try:
            timed_wd(name, LEGS[name]())
        except Exception as e:  # noqa: BLE001
            print(f"{name:22s} FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:300]}", flush=True)


if __name__ == "__main__":
    main()
