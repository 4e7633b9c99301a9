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

# Heavyweight single-process tests, centrally tiered out of `-m fast` by
# nodeid prefix (measured 2026-08-20, single-core host, --durations: these
# alone account for ~2,400 of the tier's 2,985 s).  They build full-scale
# (85-153M param) models on CPU or the TF reference graph; the micro-model
# and op/metric/data parity core stays fast.
_SLOW_PREFIXES = (
    "test_tf_import.py::test_cli_predict_tf_checkpoint",     # 630s
    "test_tf_import.py::test_train_step_parity_vs_tf_autodiff",  # 399s
    "test_tf_import.py::test_cli_eval_tf_checkpoint",        # 147s
    "test_tf_import.py::test_reference_checkpoint_roundtrip",
    "test_tf_import.py::test_mapping_covers_model",          # 53s
    "test_end_to_end.py::",                                  # 268s
    "test_models.py::test_forward_executes[p3d_unet",        # full-size BN
    "test_models.py::test_forward_executes[inference_",      # full-size GN
    "test_models.py::test_bfloat16_forward",                 # 81s
    "test_train.py::test_multi_step_matches_single_steps",   # 137s
    "test_train.py::test_gn_model_trains",                   # 108s
    "test_train.py::test_loss_decreases",                    # 64s
    "test_train.py::test_multi_step_donated_completes_on_cpu",  # 60s
    "test_train.py::test_multi_step_gn_family",              # 53s
    "test_concat_split.py::test_flagship_decoder_forward_and_grads_match",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        mark = _MODULE_MARKS.get(mod)
        name = item.nodeid.rsplit("/", 1)[-1]
        if mark is not None:
            item.add_marker(getattr(pytest.mark, mark))
        elif "slow" in item.keywords or name.startswith(_SLOW_PREFIXES):
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)
