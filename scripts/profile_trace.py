"""Capture a jax.profiler trace of the train step and print top device ops.

Parses the xplane protobuf with TensorFlow's bundled profiler protos — no
tensorboard needed.  Usage: python scripts/profile_trace.py [n_top]
"""

import glob
import gzip
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sap3d_tpu.models.registry import build_model
from sap3d_tpu.train.state import create_train_state
from sap3d_tpu.train.steps import make_multi_train_step

TRACE_DIR = "/tmp/sap3d_trace"


def capture():
    model = build_model("p3d_unetplusplus_ds", dtype=jnp.bfloat16)
    k, batch = 4, 16
    shape = (k, batch, 16, 112, 112, 3)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.3)
    targets = jnp.asarray(rng.random(shape[:-1]).astype(np.float32))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               input_shape=shape[1:])
    step = make_multi_train_step(model, k, donate=False)
    key = jax.random.PRNGKey(1)
    state, losses = step(state, frames, targets, key)  # compile
    jax.block_until_ready(losses)
    with jax.profiler.trace(TRACE_DIR):
        s, losses = step(state, frames, targets, key)
        s, losses = step(s, frames, targets, key)
        jax.block_until_ready(losses)


def analyze(n_top=40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, "no trace found"
    path = max(paths, key=os.path.getmtime)
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        totals: dict[str, float] = {}
        for line in plane.lines:
            if "XLA Ops" not in line.name and "xla" not in line.name.lower():
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                totals[name] = totals.get(name, 0.0) + ev.duration_ps / 1e9
        if not totals:
            continue
        print(f"\n=== {plane.name} (total {sum(totals.values()):.1f} ms over "
              f"2 calls = 8 steps) ===")
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:n_top]:
            print(f"{ms / 8:9.3f} ms/step  {name[:140]}")


if __name__ == "__main__":
    capture()
    analyze(int(sys.argv[1]) if len(sys.argv) > 1 else 40)
