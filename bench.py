#!/usr/bin/env python
"""Benchmark: 16-frame clips/sec/chip on the flagship train + inference paths.

Run on real TPU hardware (the driver runs this at the end of every round).
Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Timing methodology: on this environment's tunneled TPU runtime,
jax.block_until_ready can return before execution completes, so naive timing
over-reports by orders of magnitude.  Every measurement here (a) chains
iterations through a data dependency (the train state, or an input-feedback
scalar for inference), (b) ends with a host materialization of a scalar
derived from the final result, and (c) differences two iteration counts to
cancel the constant dispatch/transfer overhead.  Calibration: an 8192^3 bf16
matmul measures 187 TFLOP/s on the v5e chip (95% of nominal peak) under this
scheme.

The reference publishes no numbers (BASELINE.md), so the baseline is
established empirically: the first recorded run writes BENCH_BASELINE.json
and later runs report speedup against it.
"""

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sap3d_tpu.models.registry import build_model
from sap3d_tpu.train.state import create_train_state
from sap3d_tpu.train.steps import make_multi_train_step, make_train_step

FLAGSHIP = "p3d_unetplusplus_ds"
BASELINE_FILE = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")


def _bench_model() -> str:
    """BENCH_MODEL selects the benched variant (default: the flagship).

    Lets the same instrument measure the GN+CBAM family (BASELINE.json
    configs 2-3, reference gn/p3d_gn.py) — e.g.
    BENCH_MODEL=inference_p3d_sa_decoder_block python bench.py."""
    return os.environ.get("BENCH_MODEL", FLAGSHIP)


def _bench_wd() -> float:
    """BENCH_WD: coupled-L2 weight decay for the train state (the GN
    trainer's production config uses 5e-4, reference gn/p3d_gn.py:14-21)."""
    return float(os.environ.get("BENCH_WD", "0"))


def _diff_time(run, n_small=3, n_large=13):
    """Median seconds/iteration over BENCH_REPEATS (default 3) paired
    (n_small, n_large) differencing passes, plus the relative spread.

    Round-4 lesson (BASELINE.md part E): single-shot measurements on the
    tunneled runtime carry ±1.7% run-to-run jitter, below which A/B deltas
    were being adjudicated post-hoc.  Repeating the paired differencing and
    reporting median ± spread makes the noise band part of the record: a
    delta inside the band is declared a tie, not a win.

    Returns (sec_per_iter_median, spread_frac) where spread_frac =
    (max - min) / median across repeats (0.0 when repeats == 1).
    """
    repeats = max(1, int(os.environ.get("BENCH_REPEATS", "3")))
    run(2)  # warmup (compile + cache)
    estimates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run(n_small)
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(n_large)
        t_large = time.perf_counter() - t0
        estimates.append((t_large - t_small) / (n_large - n_small))
    med = float(np.median(estimates))
    spread = (max(estimates) - min(estimates)) / med if repeats > 1 else 0.0
    return med, spread


def _peak_flops() -> float:
    """Nominal bf16 peak of the local chip (for MFU).  Overridable via
    BENCH_PEAK_FLOPS for other parts."""
    if "BENCH_PEAK_FLOPS" in os.environ:
        return float(os.environ["BENCH_PEAK_FLOPS"])
    kind = jax.devices()[0].device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 197e12  # TPU v5e bf16
    if "v5p" in kind or "v5" in kind:
        return 459e12  # TPU v5p bf16
    if "v4" in kind:
        return 275e12
    return 197e12


def _compiled_flops(jitted, *args) -> float | None:
    """Total FLOPs of the compiled executable per XLA cost analysis."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def bench_train(batch: int, steps_per_call: int = 4):
    """(clips/sec, MFU) for the flagship train step (fwd+bwd+Adam+BN updates).

    Uses the fused multi-step (lax.scan) path WITH state donation — the
    production configuration (train/trainer.py runs donate=True, and the
    K-step scan amortizes per-dispatch host latency, +45% on the tunneled
    v5e).  Donation consumes each run's input state, so every timing run
    starts from a fresh device copy of the initial state (a constant per-run
    cost that the N-differencing cancels).
    MFU = XLA cost-analysis FLOPs of the compiled SINGLE-step program times K,
    divided by measured wall time and the chip's nominal bf16 peak.  (The
    K-step program's own cost analysis counts the lax.scan body once, not K
    times, so it under-reports by ~K; the single-step program has no loop.)
    """
    model = build_model(_bench_model(), dtype="bfloat16")
    k = steps_per_call
    shape = (k, batch, 16, 112, 112, 3)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.3)
    targets = jnp.asarray(rng.random(shape[:-1]).astype(np.float32))
    state0 = create_train_state(
        model, jax.random.PRNGKey(0), input_shape=shape[1:],
        weight_decay=_bench_wd(),
    )
    step = make_multi_train_step(model, k, donate=True)
    key = jax.random.PRNGKey(1)
    copy_state = jax.jit(lambda s: jax.tree.map(jnp.copy, s))

    def run(n):
        state = copy_state(state0)  # donation-safe fresh buffers
        losses = None
        for _ in range(n):
            state, losses = step(state, frames, targets, key)
        return float(losses[-1])  # host materialization forces completion

    sec_per_call, spread = _diff_time(run)
    single = make_train_step(model, donate=False)
    flops = _compiled_flops(single, state0, frames[0], targets[0], key)
    mfu = (flops * k / sec_per_call / _peak_flops()) if flops else None
    return k * batch / sec_per_call, mfu, spread


def bench_infer(batch: int):
    """(clips/sec, MFU) for the flagship forward (gen_pred path), chained."""
    model = build_model(_bench_model(), dtype="bfloat16")
    shape = (batch, 16, 112, 112, 3)
    frames = jnp.asarray(
        np.random.default_rng(0).normal(size=shape).astype(np.float32) * 0.3
    )
    state = create_train_state(model, jax.random.PRNGKey(0), input_shape=shape)

    @jax.jit
    def chained(s, f):
        out = model.apply(
            {"params": s.params, "batch_stats": s.batch_stats}, f, train=False
        )
        # feed a scalar of the output back so iteration i+1 depends on i
        return f + out.mean().astype(f.dtype) * 1e-6, out

    def run(n):
        f = frames
        out = None
        for _ in range(n):
            f, out = chained(state, f)
        return float(out.reshape(-1)[0])

    sec_per_call, spread = _diff_time(run)
    flops = _compiled_flops(chained, state, frames)
    mfu = (flops / sec_per_call / _peak_flops()) if flops else None
    return batch / sec_per_call, mfu, spread


def _probe_devices(timeout_s: float) -> str | None:
    """None if jax.devices() completes in a bounded subprocess, else a
    human-readable failure reason.

    When the axon relay tunnel is down, jax.devices() BLOCKS indefinitely
    (observed 2026-08-17: the relay listener vanished for 8+ hours) — a
    hang here would stall the driver's end-of-round bench run, so probe in
    a killable child first and fail fast with an honest error record.  A
    child that CRASHES (import error, libtpu contention, ...) is reported
    as a crash with its stderr, not blamed on the tunnel.
    """
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        return (f"device acquisition did not complete in {timeout_s:.0f}s "
                "(relay tunnel down?)")
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()[-3:]
        return (f"device probe exited {r.returncode}: " + " | ".join(tail))
    return None


def main():
    probe_timeout = float(os.environ.get("BENCH_PROBE_TIMEOUT", "300"))
    reason = _probe_devices(probe_timeout)
    if reason is not None:
        print(json.dumps({
            "metric": "train clips/sec/chip (16-frame, p3d_unetplusplus_ds)",
            "value": 0.0,
            "unit": "clips/sec",
            "vs_baseline": 0.0,
            "error": f"TPU unreachable — no measurement taken: {reason}",
        }))
        raise SystemExit(2)
    platform = jax.devices()[0].platform
    # batch knee history on v5e (BASELINE.md): r01 single-step 8->54.8,
    # 16->97.7, 32->99.0 (knee 16); r4 after the flash-bwd scoped-VMEM fix
    # unlocked b=32 compiles, the 4-step-scan sweep moved it: b16k4 154.8,
    # b24k4 154.7, b32k4 156.8, b32k8 157.1 clips/s -> default 32 / k=8.
    train_batch = int(os.environ.get("BENCH_TRAIN_BATCH", "32"))
    train_k = int(os.environ.get("BENCH_TRAIN_K", "8"))
    infer_batch = int(os.environ.get("BENCH_INFER_BATCH", "16"))

    train_cps, train_mfu, train_spread = bench_train(train_batch, train_k)
    infer_cps, infer_mfu, infer_spread = bench_infer(infer_batch)

    baseline = None
    if _bench_model() == FLAGSHIP and os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f)
        if baseline.get("methodology") != "chained+materialize":
            baseline = None  # discard pre-fix baselines
    if baseline is None and _bench_model() == FLAGSHIP:
        baseline = {
            "train_clips_per_sec": train_cps,
            "infer_clips_per_sec": infer_cps,
            "platform": platform,
            "methodology": "chained+materialize",
        }
        try:
            with open(BASELINE_FILE, "w") as f:
                json.dump(baseline, f, indent=1)
        except OSError:
            pass

    # vs_baseline compares against the recorded FLAGSHIP r01 baseline; a
    # non-flagship BENCH_MODEL run has no recorded baseline -> 1.0 (itself).
    vs = train_cps / baseline["train_clips_per_sec"] if baseline else 1.0
    print(json.dumps({
        "metric": f"train clips/sec/chip (16-frame, {_bench_model()})",
        "value": round(train_cps, 2),
        "unit": "clips/sec",
        "vs_baseline": round(vs, 3),
        "train_mfu": round(train_mfu, 3) if train_mfu else None,
        "train_spread_pct": round(train_spread * 100, 2),
        "infer_clips_per_sec": round(infer_cps, 2),
        "infer_mfu": round(infer_mfu, 3) if infer_mfu else None,
        "infer_spread_pct": round(infer_spread * 100, 2),
        "train_batch": train_batch,
        "infer_batch": infer_batch,
        "platform": platform,
    }))


if __name__ == "__main__":
    main()
