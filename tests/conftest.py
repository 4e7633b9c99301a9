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
