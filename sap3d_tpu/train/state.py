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
    gn/train_p3d_gn_dataset.py:196).  ``weight_decay`` adds decoupled L2,
    covering the GN family's 5e-4 regularizers (reference gn/p3d_gn.py:11-22)
    — off by default for parity with the BN trainer, whose weight-decay
    collection is built but commented out of the loss (reference
    train.py:161-162).
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
    if weight_decay > 0:
        tx = optax.adamw(lr, weight_decay=weight_decay)
    else:
        tx = optax.adam(lr)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
