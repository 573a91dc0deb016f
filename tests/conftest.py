"""Test config: force a LOCAL CPU backend with 8 virtual devices.

This image registers a remote-TPU PJRT plugin ("axon") into every Python
process via a sitecustomize; its per-dispatch tunnel latency (~40 ms) makes
test suites unusably slow. The plugin wins by calling
jax.config.update("jax_platforms", "axon,cpu"), so we override the config (not
the env var) back to plain CPU before any backend client is created, and raise
the virtual host-device count to 8 so sharding tests exercise a real
multi-device Mesh without TPU hardware (the driver separately dry-runs the
multi-chip path; see __graft_entry__.dryrun_multichip).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge as _xb  # noqa: E402

# Deregister the axon factory entirely: jax initializes every registered
# plugin at first backend use even with jax_platforms=cpu, and when the
# TPU tunnel is down the axon init HANGS (not fails), wedging CPU-only
# test runs.
_xb._backend_factories.pop("axon", None)

if _xb.backends_are_initialized():  # pragma: no cover
    from jax.extend.backend import clear_backends

    clear_backends()
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# -- fast/slow tiers --------------------------------------------------------
# `pytest -m fast` keeps the inner loop under ~2 minutes (round-1 verdict
# item 9); everything in SLOW_MODULES is marked slow unless explicitly
# listed in FAST_TESTS.

SLOW_MODULES = {
    "test_blend_pallas", "test_training", "test_parallel",
    "test_guidance_training", "test_diffusion", "test_render_video_metrics",
    "test_norminit", "test_rasterize_golden",
}
FAST_TESTS = {
    "test_binning_invariants", "test_binning_order_and_ends",
    "test_binning_order_with_empty_runs", "test_depth_key_ordering_bounds",
    "test_mark_visible",
}


def pytest_configure(config):
    config.addinivalue_line("markers", "fast: quick parity/inner-loop tests")
    config.addinivalue_line("markers", "slow: full integration tests")


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        name = item.name.split("[")[0]
        if mod in SLOW_MODULES and name not in FAST_TESTS:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)
