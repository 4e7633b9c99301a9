"""Long-clip sequence parallelism: time-axis sharding over the mesh.

The reference has no sequence scaling — clips are fixed at 16 frames and the
time axis shrinks inside the net (SURVEY.md section 2.9).  Here a 64-frame
clip is sharded over 4 devices on the temporal axis; GSPMD partitions the
temporal convs/pools (halo exchanges) and gathers for the global attention.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from sap3d_tpu.core.mesh import make_time_mesh, time_sharding
from sap3d_tpu.models.p3d import P3DSaliency
from sap3d_tpu.train.state import create_train_state
from sap3d_tpu.train.steps import loss_fn_saliency

MICRO_STAGES = ((8, 1), (16, 1), (32, 1))


def micro_model(dropout_rate: float = 0.5):
    return P3DSaliency(
        decoder="unetpp",
        decoder_kwargs=dict(attention="sa", head="ds"),
        norm_mode="bn",
        stages=MICRO_STAGES,
        stem_features=8,
        dropout_rate=dropout_rate,
    )


def test_time_sharded_long_clip_matches_replicated():
    model = micro_model()
    T = 64  # 4x the reference clip length
    shape = (1, T, 16, 16, 3)
    state = create_train_state(model, jax.random.PRNGKey(0), input_shape=shape)
    frames = jnp.asarray(
        np.random.default_rng(0).normal(size=shape).astype(np.float32) * 0.3
    )

    mesh = make_time_mesh(4)
    tsh = time_sharding(mesh)
    repl = NamedSharding(mesh, P())

    def forward(s, f):
        return model.apply(
            {"params": s.params, "batch_stats": s.batch_stats}, f, train=False
        )

    sharded = jax.jit(forward, in_shardings=(repl, tsh))(
        state, jax.device_put(frames, tsh)
    )
    ref = jax.jit(forward)(state, frames)
    assert sharded.shape == (1, T, 16, 16, 1)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(ref), atol=1e-5
    )


def test_time_sharded_gradients():
    """Backward also works under time sharding (training long clips).

    Tree-wide comparison: temporal-halo bugs would surface in conv kernels
    anywhere in the network, not just in the first leaf.  The check is
    referenced to a float64 oracle so reduction-order noise is measured
    rather than guessed (tests/_asserts.py); dropout is off so the x32 and
    x64 programs compute the same mathematical function.
    """
    from _asserts import assert_grads_match

    model = micro_model(dropout_rate=0.0)
    T = 32
    shape = (1, T, 16, 16, 3)
    state = create_train_state(model, jax.random.PRNGKey(0), input_shape=shape)
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.3)
    targets = jnp.asarray(rng.random(shape[:-1]).astype(np.float32))

    mesh = make_time_mesh(4)
    tsh = time_sharding(mesh)
    repl = NamedSharding(mesh, P())

    def loss(params, f, t):
        out, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats}, f,
            train=True, mutable=["batch_stats"],
        )
        return loss_fn_saliency(out, t)

    g_sh = jax.jit(jax.grad(loss), in_shardings=(repl, tsh, repl))(
        state.params, jax.device_put(frames, tsh), targets
    )
    g_ref = jax.jit(jax.grad(loss))(state.params, frames, targets)
    jax.config.update("jax_enable_x64", True)
    try:
        to64 = lambda t: jax.tree.map(  # noqa: E731
            lambda x: np.asarray(x, np.float64), jax.device_get(t))
        g_hi = jax.jit(jax.grad(loss))(
            to64(state.params), to64(frames), to64(targets)
        )
        g_hi = jax.device_get(g_hi)
    finally:
        jax.config.update("jax_enable_x64", False)
    assert_grads_match(g_sh, g_ref, g_hi)


def test_trainer_time_mode_matches_unsharded(tmp_path):
    """The trainer's --time-shards path (core/config.TrainConfig.time_shards):
    a 2-shard time-mesh run with ring attention must reproduce the unsharded
    single-device loss trajectory (dropout off) and leave a loadable
    checkpoint.  This is the CLI-facing integration of what the op/step
    tests above prove in isolation."""
    import json
    import os

    from sap3d_tpu.core.config import (
        Config,
        DataConfig,
        ModelConfig,
        TrainConfig,
    )
    from sap3d_tpu.train.trainer import Trainer

    T, S, B, steps = 32, 16, 2, 3
    rng = np.random.default_rng(7)
    batches = [
        (
            (rng.normal(size=(B, T, S, S, 3)) * 0.3).astype(np.float32),
            rng.random((B, T, S, S)).astype(np.float32),
        )
        for _ in range(steps)
    ]

    def run(tag: str, time_shards: int) -> list[float]:
        cfg = Config(
            model=ModelConfig(name="p3d_micro_sa", dtype="float32",
                              dropout=0.0),
            data=DataConfig(video_length=T, image_size=S),
            train=TrainConfig(
                batch_size=B, max_steps=steps, num_devices=1,
                time_shards=time_shards, ring_attention=True,
                plot_iter=10**6, valid_iter=10**9, save_iter=10**9,
                model_dir=str(tmp_path / tag / "model"),
                logs_dir=str(tmp_path / tag / "logs"),
            ),
        )
        tr = Trainer(cfg, run=tag)
        try:
            tr.fit(iter(batches))
        finally:
            tr.close()
        with open(os.path.join(tr.logs_dir, "metrics.jsonl")) as f:
            losses = [json.loads(ln)["loss"] for ln in f
                      if "loss" in json.loads(ln)]
        assert os.listdir(tr.model_dir), "no checkpoint written"
        return losses

    base = run("base", time_shards=0)
    tsh = run("tsharded", time_shards=2)
    assert len(base) == steps and len(tsh) == steps
    np.testing.assert_allclose(tsh, base, rtol=5e-4)


def test_trainer_time_mode_guards():
    """Bad time-shard configs fail loudly, not with a wedged mesh."""
    import pytest

    from sap3d_tpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
    from sap3d_tpu.train.trainer import Trainer

    def cfg(time_shards, t):
        return Config(
            model=ModelConfig(name="p3d_micro_sa", dtype="float32"),
            data=DataConfig(video_length=t, image_size=16),
            train=TrainConfig(batch_size=1, time_shards=time_shards,
                              model_dir="/tmp/_tsg/model",
                              logs_dir="/tmp/_tsg/logs"),
        )

    with pytest.raises(ValueError, match="multiple of 16"):
        Trainer(cfg(time_shards=4, t=32), run="g1")
    with pytest.raises(ValueError, match="exceeds"):
        Trainer(cfg(time_shards=64, t=64 * 16), run="g2")


def test_trainer_time_mode_multi_step(tmp_path):
    """time_shards combined with steps_per_call>1: macro-batches [K,B,T,...]
    shard the TIME axis (axis 2, core/mesh.time_shard_batch(macro=True)) and
    the fused lax.scan multi-step runs under the time mesh.  Loss parity vs
    the same data through the unsharded single-step trainer."""
    import json
    import os

    from sap3d_tpu.core.config import (
        Config,
        DataConfig,
        ModelConfig,
        TrainConfig,
    )
    from sap3d_tpu.train.trainer import Trainer

    T, S, B = 32, 16, 1
    rng = np.random.default_rng(11)
    batches = [
        (
            (rng.normal(size=(B, T, S, S, 3)) * 0.3).astype(np.float32),
            rng.random((B, T, S, S)).astype(np.float32),
        )
        for _ in range(2)
    ]

    def run(tag: str, time_shards: int, steps_per_call: int) -> list[float]:
        cfg = Config(
            model=ModelConfig(name="p3d_micro_sa", dtype="float32",
                              dropout=0.0),
            data=DataConfig(video_length=T, image_size=S),
            train=TrainConfig(
                batch_size=B, max_steps=2, num_devices=1,
                time_shards=time_shards, ring_attention=True,
                steps_per_call=steps_per_call,
                plot_iter=10**6, valid_iter=10**9, save_iter=10**9,
                model_dir=str(tmp_path / tag / "model"),
                logs_dir=str(tmp_path / tag / "logs"),
            ),
        )
        tr = Trainer(cfg, run=tag)
        try:
            tr.fit(iter(batches))
        finally:
            tr.close()
        with open(os.path.join(tr.logs_dir, "metrics.jsonl")) as f:
            return [json.loads(ln)["loss"] for ln in f
                    if "loss" in json.loads(ln)]

    base = run("ms_base", time_shards=0, steps_per_call=1)
    tsh = run("ms_tsharded", time_shards=2, steps_per_call=2)
    # the K=2 macro path logs once per dispatch with the LAST micro-loss;
    # compare against the matching single-step losses
    assert len(base) == 2 and len(tsh) == 1
    np.testing.assert_allclose(tsh[-1], base[-1], rtol=5e-4)
