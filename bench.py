#!/usr/bin/env python
"""Benchmark: 16-frame clips/sec/chip on the flagship train + inference paths.

Run on real TPU hardware (the driver runs this at the end of every round).
Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The reference publishes no numbers (BASELINE.md), so the baseline is
established empirically: the first recorded run writes BENCH_BASELINE.json
and later runs report speedup against it.  Workload parity: the train step
consumes [B,16,112,112,3] clips with the smooth-L1 sum loss and Adam exactly
as reference train.py does (per-feed batch 2 there; batching is free
parallelism the reference leaves on the table, so the per-chip batch here is
whatever fills the chip best).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from sap3d_tpu.models.registry import build_model
from sap3d_tpu.train.state import create_train_state
from sap3d_tpu.train.steps import make_eval_step, make_train_step

FLAGSHIP = "p3d_unetplusplus_ds"
BASELINE_FILE = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")


def _bench_loop(fn, *args, warmup=3, iters=10, sync=None):
    for _ in range(warmup):
        out = fn(*args)
    sync(out) if sync else jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out) if sync else jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_train(batch: int, steps: int = 10) -> float:
    """Returns clips/sec for the flagship train step (fwd+bwd+Adam+BN)."""
    model = build_model(FLAGSHIP, dtype="bfloat16")
    shape = (batch, 16, 112, 112, 3)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.3)
    targets = jnp.asarray(rng.random(shape[:-1]).astype(np.float32))
    state = create_train_state(model, jax.random.PRNGKey(0), input_shape=shape)
    step = make_train_step(model, donate=False)
    drop_rng = jax.random.PRNGKey(1)

    def run():
        nonlocal state
        state, loss = step(state, frames, targets, drop_rng)
        return loss

    dt = _bench_loop(run, warmup=3, iters=steps)
    return batch / dt


def bench_infer(batch: int, steps: int = 20) -> float:
    """Returns clips/sec for the flagship forward (gen_pred path)."""
    model = build_model(FLAGSHIP, dtype="bfloat16")
    shape = (batch, 16, 112, 112, 3)
    frames = jnp.asarray(
        np.random.default_rng(0).normal(size=shape).astype(np.float32) * 0.3
    )
    state = create_train_state(model, jax.random.PRNGKey(0), input_shape=shape)
    ev = make_eval_step(model)
    dt = _bench_loop(lambda: ev(state, frames), warmup=3, iters=steps)
    return batch / dt


def main():
    platform = jax.devices()[0].platform
    train_batch = int(os.environ.get("BENCH_TRAIN_BATCH", "8"))
    infer_batch = int(os.environ.get("BENCH_INFER_BATCH", "16"))

    train_cps = bench_train(train_batch)
    infer_cps = bench_infer(infer_batch)

    baseline = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f)
    if baseline is None:
        baseline = {"train_clips_per_sec": train_cps, "infer_clips_per_sec": infer_cps,
                    "platform": platform}
        try:
            with open(BASELINE_FILE, "w") as f:
                json.dump(baseline, f, indent=1)
        except OSError:
            pass

    vs = train_cps / baseline["train_clips_per_sec"]
    print(json.dumps({
        "metric": "train clips/sec/chip (16-frame, p3d_unetplusplus_ds)",
        "value": round(train_cps, 2),
        "unit": "clips/sec",
        "vs_baseline": round(vs, 3),
        "infer_clips_per_sec": round(infer_cps, 2),
        "train_batch": train_batch,
        "infer_batch": infer_batch,
        "platform": platform,
    }))


if __name__ == "__main__":
    main()
