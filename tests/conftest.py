"""Test harness configuration.

Runs the whole suite on a *virtual 8-device CPU mesh* so the multi-chip
sharding paths (shard_map / psum min-reduces) execute in CI without TPU
hardware — the idiomatic JAX fake-multi-node backend (see SURVEY.md §4).
Must set flags before the first ``import jax``.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var JAX_PLATFORMS is overridden by the TPU plugin in this image;
# the config knob wins, so set it explicitly to keep tests on the CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache keeps repeat test runs fast.
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ptx.utils import enable_compile_cache  # noqa: E402

enable_compile_cache(jax)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running statistical parity tests"
    )
