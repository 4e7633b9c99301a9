"""Test configuration: run everything on CPU with 8 virtual devices.

This is the standard TPU-less trick for exercising jax.sharding / pjit code
paths (SURVEY.md section 4): XLA's host platform is split into 8 devices so
mesh/sharding tests run anywhere, deterministically.

The environment pins JAX_PLATFORMS=axon (TPU-via-tunnel) and a sitecustomize
re-registers that platform in every interpreter, so a plain env setdefault is
not enough — both the env var and jax.config must be forced to cpu before
any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # 8 virtual devices time-share the host cores; on a small machine a
    # full-width program can hold one all-reduce participant back past the
    # backend's default 40s rendezvous watchdog, which aborts the process.
    flags = (
        flags + " --xla_cpu_collective_call_terminate_timeout_seconds=1800"
    ).strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# Test tiers (round-5 verdict item 7): the full matrix takes >1h on one host
# (multi-device mesh tests dominate); `pytest -m fast` is the sub-5-minute
# development tier covering every op/model/metric parity test.
#
# Marks are assigned by module here; an individual test opts OUT of the fast
# tier with an explicit @pytest.mark.slow (full-scale model builds, TF
# reference graphs).  The full suite (no -m) still runs everything.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

_MODULE_MARKS = {
    "test_multihost": "multihost",
    "test_sharding": "multidevice",
    "test_tensor_parallel": "multidevice",
    "test_time_parallel": "multidevice",
    "test_ring_attention": "multidevice",
    "test_full_topology": "multidevice",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        mark = _MODULE_MARKS.get(mod)
        if mark is not None:
            item.add_marker(getattr(pytest.mark, mark))
        elif "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)
