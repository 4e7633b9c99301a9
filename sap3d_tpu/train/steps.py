"""Jitted train/eval steps with data-parallel sharding.

The reference's hot loop is ``sess.run([train_op, loss], feed_dict=...)``
(reference train.py:217); here the equivalent is a single jitted function:
forward (47 bottlenecks + attention), smooth-L1 loss (sum-reduced, reference
utils/network.py:60), backward, Adam update, BN moving-stat update — all one
XLA program with the train state donated so parameters update in place.

Sharding: batches are sharded over the mesh 'data' axis, state is replicated;
jit inserts the gradient all-reduce over ICI automatically.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sap3d_tpu.ops.layers import smooth_l1_loss
from sap3d_tpu.train.state import TrainState


def loss_fn_saliency(pred: jax.Array, target: jax.Array) -> jax.Array:
    """smooth_l1(pred, y, 1, 1, sigma=1.0) summed over all elements
    (reference train.py:159).

    Under SAP3D_HEAD_PHASE_LOSS the 'ds' head emits its PHASE layout
    [B, T/2, H/2, W/2, 8] instead of the interleaved [B,T,H,W,1]
    (models/p3d.py 'ds' branch); the sum-reduced loss is permutation-
    invariant, so space-to-depth'ing the target gives the identical loss
    and gradients while the interleave never hits HBM."""
    if pred.shape[-1] == 1:
        pred = jnp.squeeze(pred, axis=-1)  # [B,T,H,W,1] -> [B,T,H,W]
        return smooth_l1_loss(pred, target, 1.0, 1.0, sigma=1.0)
    from sap3d_tpu.ops.fast_tconv import space_to_depth3d

    assert pred.shape[-1] == 8 and pred.shape[1] * 2 == target.shape[1], (
        pred.shape, target.shape)
    return smooth_l1_loss(pred, space_to_depth3d(target, (2, 2, 2)),
                          1.0, 1.0, sigma=1.0)


def fast_dropout_key(rng: jax.Array) -> jax.Array:
    """Re-wrap an incoming PRNG key as an ``rbg``-impl key for dropout.

    The flagship's dropout site is full-resolution ([B,8,56,56,128] at x_1_3)
    — with the default threefry generator the mask bits alone cost ~6% of the
    train step on TPU (BASELINE.md round-2 ablations).  The ``rbg`` impl
    keeps threefry-quality split/fold_in semantics but generates the bits
    with the hardware-accelerated XLA RngBitGenerator, which is effectively
    free.  Dropout only needs an independent stream per step, not
    cryptographic bits, so this changes the random stream (any fixed seed
    produces a different but equally valid mask sequence) and nothing else.
    """
    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        rng = jax.random.key_data(rng)
    data = jnp.resize(rng.astype(jnp.uint32), (4,))
    return jax.random.wrap_key_data(data, impl="rbg")


def cpu_collective_patience(seconds: int = 1800) -> dict | None:
    """XLA compiler options that stop the CPU backend's collective rendezvous
    watchdog from aborting slow virtual-device runs.

    With N virtual host devices on few cores (the TPU-less sharding-test
    setup, SURVEY.md section 4), all N per-device threads share the machine;
    a heavyweight program can keep one participant away from an all-reduce
    for longer than the backend's default 40s termination timeout, which
    kills the process.  Returns None on real backends (TPU collectives have
    their own timeouts) so production compiles are untouched.
    """
    if jax.default_backend() != "cpu":
        return None
    return {"xla_cpu_collective_call_terminate_timeout_seconds": int(seconds)}


def _donation_supported() -> bool:
    """Donation is an HBM-reuse optimization; on the CPU backend it is
    worthless AND pathological: a donated-input lax.scan train program
    compiles fine but its execution never completes (observed on jax 0.8
    XLA:CPU — the k=2 micro-model scan that runs in <1s undonated hangs
    >6 min donated).  Tests and the virtual-device sharding setup all run
    on CPU, so donation is disabled there at the factory level."""
    return jax.default_backend() != "cpu"


def _one_step(model) -> Callable:
    """The single fused train-step body shared by make_train_step and
    make_multi_train_step (the scan body MUST stay numerically identical to
    the single-step path — one definition enforces it)."""

    def step(state: TrainState, frames, targets, rng):
        drop_rng = fast_dropout_key(rng)

        def loss_of(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                frames,
                train=True,
                rngs={"dropout": drop_rng},
                mutable=["batch_stats"],
            )
            return loss_fn_saliency(out, targets), dict(mutated.get("batch_stats", {}))

        (loss, new_stats), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        return state, loss

    return step


def make_train_step(
    model, mesh: Mesh | None = None, donate: bool = True, state_sharding=None,
    compiler_options: dict | None = None,
) -> Callable:
    """Returns train_step(state, frames, targets, rng) -> (state, loss).

    With a mesh, the loss stays a *global* sum over the sharded batch — the
    per-element gradient scale matches the reference's single-process math
    regardless of device count.

    ``state_sharding`` (a TrainState of NamedShardings, see
    core/sharding_rules.py) enables hybrid data+tensor parallelism: wide
    kernels live sharded on the 'model' axis, XLA propagates the activation
    shardings and inserts the collectives.
    """
    step = _one_step(model)
    donate = donate and _donation_supported()

    if mesh is None:
        return jax.jit(
            step,
            donate_argnums=(0,) if donate else (),
            compiler_options=compiler_options,
        )

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    st = state_sharding if state_sharding is not None else repl
    return jax.jit(
        step,
        in_shardings=(st, data, data, repl),
        out_shardings=(st, repl),
        donate_argnums=(0,) if donate else (),
        compiler_options=compiler_options,
    )


def make_multi_train_step(
    model, steps_per_call: int, mesh: Mesh | None = None, donate: bool = True,
    state_sharding=None, compiler_options: dict | None = None,
    unroll: int | bool = 1,
) -> Callable:
    """K train steps fused into one dispatch via lax.scan.

    multi_step(state, frames [K,B,...], targets [K,B,...], rng) ->
    (state, losses [K]).  Amortizes per-dispatch host latency (significant on
    remote/tunneled runtimes) and lets XLA overlap the inter-step boundaries;
    numerics are identical to calling the single step K times with rngs
    jax.random.fold_in(rng, i).

    ``unroll`` is forwarded to lax.scan: unrolling lets the scheduler overlap
    one step's optimizer/BN tail with the next step's forward at the cost of
    a larger program (compile time scales with the unroll factor).
    """
    step = _one_step(model)
    donate = donate and _donation_supported()

    def one(state: TrainState, xs):
        frames, targets, rng = xs
        return step(state, frames, targets, rng)

    def multi_step(state: TrainState, frames, targets, rng):
        rngs = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
            jnp.arange(steps_per_call)
        )
        return jax.lax.scan(one, state, (frames, targets, rngs),
                            unroll=unroll)

    if mesh is None:
        return jax.jit(
            multi_step,
            donate_argnums=(0,) if donate else (),
            compiler_options=compiler_options,
        )
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(None, "data"))
    st = state_sharding if state_sharding is not None else repl
    return jax.jit(
        multi_step,
        in_shardings=(st, data, data, repl),
        out_shardings=(st, repl),
        donate_argnums=(0,) if donate else (),
        compiler_options=compiler_options,
    )


def make_eval_step(model, mesh: Mesh | None = None) -> Callable:
    """Returns eval_step(state, frames) -> pred [B,T,H,W] (no dropout, BN
    running averages — reference train.py:226 feeds training=False, dropout=0).

    When the model was built with ``bn_reference_quirk=True`` (reference-
    faithful inference: bottleneck BNs on batch statistics, see
    models/p3d.py:Bottleneck), the quirk path recomputes batch stats, so
    batch_stats is made mutable and the update discarded."""
    quirk = bool(getattr(model, "bn_reference_quirk", False))

    def step(state: TrainState, frames):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if quirk:
            out, _ = model.apply(
                variables, frames, train=False, mutable=["batch_stats"]
            )
        else:
            out = model.apply(variables, frames, train=False)
        return jnp.squeeze(out, axis=-1)

    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step, in_shardings=(repl, data), out_shardings=data)


def make_forward_fn(model) -> Callable:
    """Plain jitted forward for inference: (variables, frames) -> [B,T,H,W]."""

    @jax.jit
    def forward(variables, frames):
        out = model.apply(variables, frames, train=False)
        return jnp.squeeze(out, axis=-1)

    return forward
