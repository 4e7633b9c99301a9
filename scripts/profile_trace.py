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


def _bucket(name: str) -> str:
    n = name.lstrip("%")
    if n.startswith(("copy-start", "copy-done", "copy.")):
        return "async-copy (overlapped)"
    if "custom-call" in name or "_sa." in n:
        return "pallas attention"
    if n.startswith(("convolution", "conv")):
        return "bare convolution"
    if "multiply_add" in n:
        return "optimizer fusion"
    if "reduce" in n:
        return "reduce fusion (norm stats)"
    if n.startswith(("fusion", "output_fusion", "loop_fusion")):
        return "fusion (conv+elementwise)"
    if n.startswith(("while", "jit_")):
        return "_wrapper"
    if n.startswith(("dynamic-update-slice", "dynamic-slice", "bitcast",
                     "get-tuple-element", "tuple", "slice")):
        return "data movement"
    if n.startswith("rng"):
        return "rng"
    return "other"


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
        buckets: dict[str, float] = {}
        spans: list[tuple[int, int]] = []
        wrapper_span = 0.0
        for line in plane.lines:
            if "XLA Ops" not in line.name and "xla" not in line.name.lower():
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                ms = ev.duration_ps / 1e9
                b = _bucket(name)
                if b == "_wrapper":
                    wrapper_span = max(wrapper_span, ms)
                    continue
                totals[name] = totals.get(name, 0.0) + ms
                buckets[b] = buckets.get(b, 0.0) + ms
                spans.append((ev.offset_ps, ev.offset_ps + ev.duration_ps))
        if not totals:
            continue
        # busy time = union of op spans (async copies overlap real work)
        spans.sort()
        busy = 0
        cur_s, cur_e = spans[0]
        for s_, e_ in spans[1:]:
            if s_ > cur_e:
                busy += cur_e - cur_s
                cur_s, cur_e = s_, e_
            else:
                cur_e = max(cur_e, e_)
        busy += cur_e - cur_s
        print(f"\n=== {plane.name} ===")
        print(f"wrapper span {wrapper_span / 8:.1f} ms/step, op-span union "
              f"{busy / 1e9 / 8:.1f} ms/step (gap = scheduler idle)")
        print("-- buckets (sum of op durations; async copies overlap) --")
        for b, ms in sorted(buckets.items(), key=lambda kv: -kv[1]):
            print(f"{ms / 8:9.3f} ms/step  {b}")
        print("-- top ops --")
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:n_top]:
            print(f"{ms / 8:9.3f} ms/step  {name[:120]}")


if __name__ == "__main__":
    capture()
    analyze(int(sys.argv[1]) if len(sys.argv) > 1 else 40)
