"""Ablation timing of the flagship train step on the real chip.

Times the fused K-step train program under several single-variable ablations
to decompose the step: attention on/off, Pallas on/off, dropout on/off,
K, batch.  Uses bench.py's chained N-differencing methodology.
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sap3d_tpu.models.p3d import P3DSaliency
from sap3d_tpu.models.registry import MODEL_REGISTRY
from sap3d_tpu.train.state import create_train_state
from sap3d_tpu.train.steps import make_multi_train_step


def time_case(name, batch=16, k=4, attention="sa", dropout=0.5,
              donate=False, unroll=1, compiler_options=None):
    cfg = dict(MODEL_REGISTRY["p3d_unetplusplus_ds"])
    cfg["decoder_kwargs"] = dict(cfg["decoder_kwargs"], attention=attention)
    model = P3DSaliency(**cfg, dropout_rate=dropout, dtype=jnp.bfloat16)
    shape = (batch, 16, 112, 112, 3)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        np.tile(rng.normal(size=(1, k) + shape).astype(np.float32) * 0.3,
                (1, 1, 1, 1, 1, 1))[0]
    )
    targets = jnp.asarray(rng.random((k,) + shape[:-1]).astype(np.float32))

    def fresh_state():
        return create_train_state(
            model, jax.random.PRNGKey(0), input_shape=shape
        )

    step = make_multi_train_step(model, k, donate=donate, unroll=unroll,
                                 compiler_options=compiler_options)
    key = jax.random.PRNGKey(1)

    def run(n, s):
        losses = None
        for i in range(n):
            s, losses = step(s, frames, targets, jax.random.fold_in(key, i))
        return float(losses[-1])

    # with donation each run consumes its state, so create them up front
    states = [fresh_state() for _ in range(3)] if donate \
        else [fresh_state()] * 3
    run(2, states[0])
    t0 = time.perf_counter()
    run(3, states[1])
    t_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(13, states[2])
    t_l = time.perf_counter() - t0
    sec = (t_l - t_s) / 10
    ms_per_step = sec / k * 1e3
    print(f"{name:28s} {ms_per_step:7.1f} ms/step  "
          f"{k * batch / sec:6.1f} clips/s", flush=True)
    return ms_per_step


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "base"):
        time_case("base (b16 k4 sa drop)")
    if which in ("all", "donate"):
        time_case("donate=True (production)", donate=True)
    if which in ("all", "unroll"):
        time_case("unroll=2", unroll=2)
        time_case("unroll=2 donate", unroll=2, donate=True)
    if which == "flags":
        for kib in (32768, 65536):
            time_case(
                f"scoped-vmem {kib}kib",
                compiler_options={"xla_tpu_scoped_vmem_limit_kib": str(kib)},
            )
    if which in ("all", "nodrop"):
        time_case("dropout off", dropout=0.0)
    if which in ("all", "nosa"):
        time_case("attention none", attention="none")
    if which in ("all", "noPallas"):
        os.environ["SAP3D_DISABLE_PALLAS"] = "1"
        time_case("pallas off")
        del os.environ["SAP3D_DISABLE_PALLAS"]
    if which in ("all", "k8"):
        time_case("k=8", k=8)
    if which in ("all", "b24"):
        time_case("batch 24", batch=24)


if __name__ == "__main__":
    main()
