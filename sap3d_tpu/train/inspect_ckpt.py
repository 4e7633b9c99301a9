"""Checkpoint variable inspector (reference utils/test_model.py parity).

The reference prints name + shape of every conv variable in a TF checkpoint
(reference utils/test_model.py:17-27); here the same view over an Orbax
checkpoint's params pytree, plus totals.

Usage: python -m sap3d_tpu.train.inspect_ckpt <checkpoint_dir> [filter]
"""

from __future__ import annotations

import sys

import numpy as np
import orbax.checkpoint as ocp


def inspect(directory: str, name_filter: str = "") -> list[tuple[str, tuple]]:
    """Returns [(path, shape)] for every parameter matching the filter."""
    mgr = ocp.CheckpointManager(directory)
    try:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {directory}")
        restored = mgr.restore(step)
    finally:
        mgr.close()

    import jax

    rows = []
    flat = jax.tree_util.tree_flatten_with_path(restored.get("params", restored))[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if name_filter in name:
            rows.append((name, tuple(np.shape(leaf))))
    return rows


def inspect_tf(ckpt_path: str, name_filter: str = "") -> list[tuple[str, tuple]]:
    """Same view over a reference TF1 Saver checkpoint (the exact workflow of
    reference utils/test_model.py:17-27, which filters for 'conv'; pass that
    as the filter to reproduce its output)."""
    from sap3d_tpu.interop.tf_import import load_tf_checkpoint

    return sorted(
        (name, tuple(np.shape(arr)))
        for name, arr in load_tf_checkpoint(ckpt_path).items()
        if name_filter in name
    )


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    tf_mode = "--tf" in argv
    argv = [a for a in argv if a != "--tf"]
    if not argv:
        print("usage: inspect_ckpt [--tf] <checkpoint> [filter]",
              file=sys.stderr)
        return 2
    name_filter = argv[1] if len(argv) > 1 else ""
    rows = (inspect_tf if tf_mode else inspect)(argv[0], name_filter)
    total = 0
    for name, shape in rows:
        print(f"{name}  {shape}")
        total += int(np.prod(shape)) if shape else 1
    print(f"-- {len(rows)} tensors, {total / 1e6:.2f}M parameters")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
