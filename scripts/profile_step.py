"""Decompose the flagship train step by ABLATION on the real chip.

Isolated per-site timings (profile_decoder.py) miss fusion interactions;
this script times the FULL jitted train step under ablations instead:

  full           — production step (fwd+bwd+Adam+BN), batch 16
  no_sa          — attention='none' (removes the 4 SA sites fwd+bwd)
  no_dropout     — dropout_rate=0
  fwd_only       — model.apply only (train=True shapes, no grad)
  no_optimizer   — value_and_grad but no Adam/BN update
  fp32_loss      — (control) nothing ablated, k=1 vs k=4 scan overhead
  stage1_thin    — encoder stage 1 at 1 bottleneck instead of 3 (same
                   shapes everywhere downstream); (full − stage1_thin)
                   = the true in-step cost of 2 stage-1 blocks, so
                   stage-1 non-entry blocks cost 3/2 × the delta.
                   Lesson of r4 part D: isolated per-site profiles
                   over-state (they time dx-of-input the real step never
                   computes) — only full-step ablations like these decide
                   whether a stage is worth a lever.
  stage3_thin    — encoder stage 3 at 12 bottlenecks instead of 36
                   (delta = 24 stage-3 blocks)

Differences between ablations bound each component's true in-context cost.
Chained N-differencing methodology (bench.py docstring).
"""

import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np

from sap3d_tpu.models.p3d import P3DSaliency
from sap3d_tpu.models.registry import build_model
from sap3d_tpu.train.state import create_train_state
from sap3d_tpu.train.steps import fast_dropout_key, loss_fn_saliency

BATCH = 16
SHAPE = (BATCH, 16, 112, 112, 3)


def data():
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=SHAPE).astype(np.float32) * 0.3)
    targets = jnp.asarray(
        rng.uniform(size=(BATCH, 16, 112, 112)).astype(np.float32)
    )
    return frames, targets


def chained_state(step, state0, frames, targets, n_small=3, n_large=10):
    key = jax.random.PRNGKey(1)
    # step donates its state input, so every timing run must start from a
    # FRESH device copy — reusing state0 directly would access deleted
    # buffers on the second run (same scheme as bench.py's bench_train; the
    # constant per-run copy cost cancels in the N-differencing).
    copy_state = jax.jit(lambda s: jax.tree.map(jnp.copy, s))

    def run(n):
        state = copy_state(state0)
        out = None
        for _ in range(n):
            state, out = step(state, frames, targets, key)
        return float(jnp.sum(out.astype(jnp.float32)).block_until_ready())

    run(2)
    t0 = time.perf_counter(); run(n_small); ts = time.perf_counter() - t0
    t0 = time.perf_counter(); run(n_large); tl = time.perf_counter() - t0
    return (tl - ts) / (n_large - n_small) * 1e3


def make_step(model, optimizer=True):
    def step(state, frames, targets, rng):
        drop_rng = fast_dropout_key(rng)

        def loss_of(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                frames, train=True, rngs={"dropout": drop_rng},
                mutable=["batch_stats"],
            )
            return loss_fn_saliency(out, targets), dict(
                mutated.get("batch_stats", {}))

        (loss, new_stats), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        if optimizer:
            state = state.apply_gradients(grads).replace(batch_stats=new_stats)
            return state, loss
        # consume grads without the Adam/BN update
        g0 = sum(jnp.sum(g.astype(jnp.float32)) for g in jax.tree.leaves(grads))
        return state, loss + g0 * 0

    return jax.jit(step, donate_argnums=(0,))


def timed(name, model, optimizer=True):
    frames, targets = data()
    state = create_train_state(model, jax.random.PRNGKey(0),
                               input_shape=SHAPE)
    ms = chained_state(make_step(model, optimizer), state, frames, targets)
    print(f"{name:22s} {ms:8.2f} ms/step   {BATCH / ms * 1e3:6.1f} clips/s",
          flush=True)
    return ms


def fwd_only(model):
    frames, _ = data()
    state = create_train_state(model, jax.random.PRNGKey(0),
                               input_shape=SHAPE)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    key = fast_dropout_key(jax.random.PRNGKey(1))

    @jax.jit
    def f(v, frames):
        out, _ = model.apply(v, frames, train=True, rngs={"dropout": key},
                             mutable=["batch_stats"])
        return out

    def run(n):
        x = frames
        out = None
        for _ in range(n):
            out = f(variables, x)
            x = frames + jnp.sum(out.astype(jnp.float32)).astype(x.dtype) * 0
        return float(jnp.sum(out.astype(jnp.float32)).block_until_ready())

    run(2)
    t0 = time.perf_counter(); run(3); ts = time.perf_counter() - t0
    t0 = time.perf_counter(); run(10); tl = time.perf_counter() - t0
    ms = (tl - ts) / 7 * 1e3
    print(f"{'fwd_only (train mode)':22s} {ms:8.2f} ms/step", flush=True)


def main():
    which = sys.argv[1:] or ["full", "no_sa", "no_dropout", "no_opt", "fwd"]
    if "full" in which:
        timed("full", build_model("p3d_unetplusplus_ds", dtype="bfloat16"))
    if "no_sa" in which:
        timed("no_sa", build_model("p3d_unetplusplus_nonsa", dtype="bfloat16"))
    if "no_dropout" in which:
        timed("no_dropout", P3DSaliency(
            decoder="unetpp", decoder_kwargs=dict(attention="sa", head="ds"),
            dropout_rate=0.0, dtype=jnp.bfloat16))
    if "no_opt" in which:
        timed("no_optimizer",
              build_model("p3d_unetplusplus_ds", dtype="bfloat16"),
              optimizer=False)
    if "fwd" in which:
        fwd_only(build_model("p3d_unetplusplus_ds", dtype="bfloat16"))
    # Encoder-stage thin ablations: swap one stage's block count, keep all
    # feature shapes (stage entry block retained, so strides/projection and
    # every skip shape are unchanged; only the A/B/C cycling phase of later
    # blocks shifts, which is FLOP-neutral — every st_type runs one S and
    # one T conv).
    if "stage1_thin" in which:
        timed("stage1_thin (3->1)", P3DSaliency(
            decoder="unetpp", decoder_kwargs=dict(attention="sa", head="ds"),
            stages=((64, 1), (128, 8), (256, 36)), dtype=jnp.bfloat16))
    if "stage2_thin" in which:
        timed("stage2_thin (8->2)", P3DSaliency(
            decoder="unetpp", decoder_kwargs=dict(attention="sa", head="ds"),
            stages=((64, 3), (128, 2), (256, 36)), dtype=jnp.bfloat16))
    if "stage3_thin" in which:
        timed("stage3_thin (36->12)", P3DSaliency(
            decoder="unetpp", decoder_kwargs=dict(attention="sa", head="ds"),
            stages=((64, 3), (128, 8), (256, 12)), dtype=jnp.bfloat16))


if __name__ == "__main__":
    main()
