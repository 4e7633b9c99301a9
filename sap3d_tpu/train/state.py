"""Train state: parameters, BN statistics, optimizer state, step counter.

The reference checkpoints trainables + BN moving stats (reference
train.py:180-185); the equivalent full-state pytree here also carries the
Adam moments and the step so resume is exact.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import unfreeze


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def kernel_mask(params) -> Any:
    """True for conv/dense ``kernel`` leaves, False elsewhere.

    This is the set the reference regularizes: its l2_reg kernel_regularizer
    and get_conv_weight weight-decay apply to convolution weights only —
    never to norm scales (gamma/beta) or biases (reference
    gn/p3d_gn.py:14-21,54)."""

    def is_kernel(path, _leaf) -> bool:
        last = path[-1]
        name = getattr(last, "key", None)
        return name == "kernel"

    return jax.tree_util.tree_map_with_path(is_kernel, params)


def make_optimizer(lr: float, weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Adam, optionally with COUPLED L2 on kernels only.

    The reference adds ``wd * ||W||^2`` terms to the LOSS (reference
    gn/p3d_gn.py:14-21,54 builds l2_reg(5e-4) kernel regularizers), i.e. the
    decay term enters the gradient BEFORE Adam's moment statistics — coupled
    L2, not AdamW-style decoupled decay.  optax equivalent: add_decayed_weights
    ahead of scale_by_adam, masked to kernel leaves."""
    if weight_decay > 0:
        return optax.chain(
            optax.masked(optax.add_decayed_weights(weight_decay), kernel_mask),
            optax.scale_by_adam(),
            optax.scale(-lr),
        )
    return optax.adam(lr)


def create_train_state(
    model,
    rng: jax.Array,
    input_shape=(2, 16, 112, 112, 3),
    lr: float = 1e-4,
    weight_decay: float = 0.0,
) -> TrainState:
    """Initialize params/batch_stats and the Adam optimizer.

    Adam(lr) matches the reference optimizer (reference train.py:168; the GN
    trainer also uses Adam despite its "Momentum" banner, reference
    gn/train_p3d_gn_dataset.py:196).  ``weight_decay`` adds the GN family's
    coupled L2 on conv kernels only (see make_optimizer; reference
    gn/p3d_gn.py:14-21,54) — off by default for parity with the BN trainer,
    whose weight-decay collection is built but commented out of the loss
    (reference train.py:161-162).
    """
    params_rng, dropout_rng = jax.random.split(rng)
    x = jnp.zeros(input_shape, jnp.float32)
    variables = model.init(
        {"params": params_rng, "dropout": dropout_rng}, x, train=False
    )
    params = variables["params"]
    # plain dict ({} for norm-stat-free models, e.g. the GN family) so the
    # pytree structure is stable across scan carries and checkpoint restores
    batch_stats = unfreeze(variables.get("batch_stats", {}))
    tx = make_optimizer(lr, weight_decay)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
