"""Checkpoint save/restore with keep-last-K retention.

Reference behavior (reference train.py:180-185, 266-267): save trainables +
BN moving stats every ``save_iter`` steps under ``model/<run>/p3d_<step>.ckpt``
with max_to_keep=10; ``--pretrain <run>`` restores the latest checkpoint.
Here the full train state pytree (params, batch_stats, opt_state, step) is
saved atomically via Orbax, so resume is exact (optimizer moments included —
an improvement over the reference, which dropped Adam state on restore).

Saves are ASYNC: ``save`` returns as soon as the state has been snapshotted
off the device (Orbax's async checkpointing), so the ~1GB flagship state
(85M params + Adam moments) serializes to disk while the train loop keeps
stepping.  Barriers exist only where correctness needs them: before a
restore, before starting a newer save (Orbax enforces one in-flight save),
and at ``close``.  Exact-resume is proven by the round-trip test
(tests/test_train.py)."""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from sap3d_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 10):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, state: TrainState, step: int | None = None) -> None:
        step = int(state.step) if step is None else step
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
        }
        # async: returns once the arrays are snapshotted host-side; disk
        # serialization trails in Orbax's background thread
        self._mgr.save(step, args=ocp.args.StandardSave(payload))

    def wait_until_finished(self) -> None:
        """Barrier for any in-flight async save."""
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state: TrainState, step: int | None = None) -> TrainState:
        """Restore into the structure of ``state`` (shapes must match)."""
        self._mgr.wait_until_finished()  # never read a half-written save
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
        }
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        return state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=jax.numpy.asarray(restored["step"]),
        )

    def close(self):
        self._mgr.close()


def try_restore_latest(state: TrainState, directory: str) -> tuple[TrainState, bool]:
    """Auto-resume helper: restore the latest checkpoint if one exists."""
    if not os.path.isdir(directory):
        return state, False
    mgr = CheckpointManager(directory)
    try:
        if mgr.latest_step() is None:
            return state, False
        return mgr.restore(state), True
    finally:
        mgr.close()
