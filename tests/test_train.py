"""Training-step tests: loss decreases, BN stats update, eval determinism.

Uses a micro P3D (1 bottleneck per stage) so CPU compiles stay fast while
exercising the full architecture: projection blocks, A/B/C sub-structures,
attention, BN state threading, dropout rng, Adam update.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sap3d_tpu.models.p3d import P3DSaliency
from sap3d_tpu.train.state import create_train_state
from sap3d_tpu.train.steps import make_eval_step, make_train_step

MICRO_STAGES = ((8, 1), (16, 1), (32, 1))
SHAPE = (2, 16, 16, 16, 3)


def micro_model(**kw):
    defaults = dict(
        decoder="unetpp",
        decoder_kwargs=dict(attention="sa", head="ds"),
        norm_mode="bn",
        stages=MICRO_STAGES,
        stem_features=8,
    )
    defaults.update(kw)
    return P3DSaliency(**defaults)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    frames = rng.normal(size=SHAPE).astype(np.float32) * 0.3
    # learnable target: bright blob where the red channel is large
    targets = (frames[..., 2] > 0.2).astype(np.float32)
    return jnp.asarray(frames), jnp.asarray(targets)


def test_loss_decreases(batch):
    frames, targets = batch
    model = micro_model()
    state = create_train_state(
        model, jax.random.PRNGKey(0), input_shape=SHAPE, lr=1e-3
    )
    step = make_train_step(model, donate=False)
    losses = []
    for i in range(8):
        state, loss = step(state, frames, targets, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_bn_stats_change(batch):
    frames, targets = batch
    model = micro_model()
    state = create_train_state(model, jax.random.PRNGKey(0), input_shape=SHAPE)
    before = jax.tree.map(lambda x: x.copy(), state.batch_stats)
    step = make_train_step(model, donate=False)
    state, _ = step(state, frames, targets, jax.random.PRNGKey(0))
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), before, state.batch_stats
    )
    assert max(jax.tree.leaves(diffs)) > 0


def test_eval_step_deterministic(batch):
    frames, _ = batch
    model = micro_model()
    state = create_train_state(model, jax.random.PRNGKey(0), input_shape=SHAPE)
    ev = make_eval_step(model)
    p1 = np.asarray(ev(state, frames))
    p2 = np.asarray(ev(state, frames))
    np.testing.assert_array_equal(p1, p2)
    assert p1.shape == (2, 16, 16, 16)
    assert p1.min() >= 0 and p1.max() <= 1  # sigmoid head


def test_gn_model_trains(batch):
    """GN+CBAM family: no batch_stats, weight decay on."""
    frames, targets = batch
    model = micro_model(
        decoder="gn_decoder_block", decoder_kwargs=dict(use_sa=True),
        norm_mode="gn", backbone_cbam=True,
    )
    state = create_train_state(
        model, jax.random.PRNGKey(0), input_shape=SHAPE, lr=1e-3,
        weight_decay=5e-4,
    )
    assert not jax.tree.leaves(state.batch_stats)
    step = make_train_step(model, donate=False)
    l0 = None
    for i in range(6):
        state, loss = step(state, frames, targets, jax.random.PRNGKey(i))
        l0 = l0 or float(loss)
    assert float(loss) < l0


def test_weight_decay_kernels_only():
    """Weight decay must hit conv/dense kernels ONLY — never norm scales or
    biases (reference gn/p3d_gn.py:14-21,54 regularizes kernel weights only)
    — and must be COUPLED (enters the gradient before Adam, like the
    reference's in-loss L2 terms)."""
    from sap3d_tpu.train.state import kernel_mask, make_optimizer

    params = {
        "Conv_0": {"kernel": jnp.ones((3, 3, 4, 8)), "bias": jnp.ones((8,))},
        "GroupNorm_0": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))},
    }
    mask = kernel_mask(params)
    assert mask["Conv_0"]["kernel"] is True
    assert mask["Conv_0"]["bias"] is False
    assert mask["GroupNorm_0"]["scale"] is False

    wd, lr = 5e-4, 1e-4
    tx = make_optimizer(lr, wd)
    opt_state = tx.init(params)
    zero_grads = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(zero_grads, opt_state, params)
    # zero gradient: only the decay term moves anything, and only kernels
    assert float(jnp.abs(updates["Conv_0"]["kernel"]).max()) > 0
    assert float(jnp.abs(updates["Conv_0"]["bias"]).max()) == 0.0
    assert float(jnp.abs(updates["GroupNorm_0"]["scale"]).max()) == 0.0
    assert float(jnp.abs(updates["GroupNorm_0"]["bias"]).max()) == 0.0
    # coupled: the decayed gradient wd*w goes THROUGH Adam, so the first
    # update is the Adam-normalized step -lr*g/(sqrt(g^2)+eps) ~= -lr,
    # NOT AdamW's -lr*wd*w
    k = float(updates["Conv_0"]["kernel"].ravel()[0])
    assert abs(k + lr) < lr * 0.1, k


def test_dropout_uses_rng(batch):
    """Different dropout rngs must give different training losses."""
    frames, targets = batch
    model = micro_model()
    state = create_train_state(model, jax.random.PRNGKey(0), input_shape=SHAPE)
    step = make_train_step(model, donate=False)
    _, l1 = step(state, frames, targets, jax.random.PRNGKey(1))
    _, l2 = step(state, frames, targets, jax.random.PRNGKey(2))
    assert float(l1) != float(l2)


def test_multi_step_matches_single_steps(batch):
    """K fused scan steps == K sequential single steps (same fold_in rngs)."""
    from sap3d_tpu.train.steps import make_multi_train_step

    frames, targets = batch
    K = 3
    kf = jnp.stack([frames] * K)
    kt = jnp.stack([targets] * K)
    rng = jax.random.PRNGKey(42)

    model = micro_model()
    s_multi = create_train_state(model, jax.random.PRNGKey(0), input_shape=SHAPE)
    mstep = make_multi_train_step(model, K, donate=False)
    s_multi, losses = mstep(s_multi, kf, kt, rng)

    s_seq = create_train_state(model, jax.random.PRNGKey(0), input_shape=SHAPE)
    step = make_train_step(model, donate=False)
    seq_losses = []
    for i in range(K):
        s_seq, loss = step(s_seq, frames, targets, jax.random.fold_in(rng, i))
        seq_losses.append(float(loss))

    # Loss trajectory equality across all K steps is the semantic check;
    # exact param equality is not expected (scan body compiles separately
    # from the single step, and Adam's ~lr*sign(grad) first-step updates
    # amplify reassociation-level rounding differences).
    np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=1e-5)
    assert int(s_multi.step) == int(s_seq.step) == K


def test_multi_step_gn_family(batch):
    """GN models (no batch_stats) must work in the scan carry (plain-dict
    pytree stability)."""
    from sap3d_tpu.train.steps import make_multi_train_step

    frames, targets = batch
    K = 2
    model = micro_model(
        decoder="gn_easy", decoder_kwargs=dict(wide_pool4=False),
        norm_mode="gn", backbone_cbam=True,
    )
    state = create_train_state(model, jax.random.PRNGKey(0), input_shape=SHAPE)
    assert state.batch_stats == {}
    mstep = make_multi_train_step(model, K, donate=False)
    state, losses = mstep(
        state, jnp.stack([frames] * K), jnp.stack([targets] * K),
        jax.random.PRNGKey(0),
    )
    assert np.isfinite(np.asarray(losses)).all()
    assert int(state.step) == K


def test_multi_step_donated_completes_on_cpu():
    """Donated-input lax.scan programs hang at execution on XLA:CPU (jax
    0.8); the step factories disable donation on the CPU backend, so the
    production default (donate=True) must complete.  The guarded failure
    mode is a HANG, so the step runs in a bounded subprocess — if the
    guard regresses, this test fails with a timeout instead of wedging the
    suite forever."""
    import os
    import subprocess
    import sys

    script = """
import jax, numpy as np
jax.config.update("jax_platforms", "cpu")
from sap3d_tpu.models.registry import build_model
from sap3d_tpu.train.state import create_train_state
from sap3d_tpu.train.steps import make_multi_train_step

model = build_model("p3d_micro", dtype="float32")
k, b = 2, 2
shape = (k, b, 16, 16, 16, 3)
rng = np.random.default_rng(0)
frames = np.asarray(rng.normal(size=shape), np.float32)
targets = np.asarray(rng.random(shape[:-1]), np.float32)
state = create_train_state(model, jax.random.PRNGKey(0),
                           input_shape=shape[1:])
step = make_multi_train_step(model, k, donate=True)
state, losses = step(state, frames, targets, jax.random.PRNGKey(1))
assert np.isfinite(float(losses[-1]))
print("DONATED_OK")
"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo, JAX_PLATFORMS="cpu")
    env.pop("PYTEST_CURRENT_TEST", None)
    try:
        r = subprocess.run(
            [sys.executable, "-c", script], env=env, timeout=600,
            capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        pytest.fail("donated multi-step hung on XLA:CPU — the "
                    "_donation_supported() guard has regressed")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "DONATED_OK" in r.stdout
