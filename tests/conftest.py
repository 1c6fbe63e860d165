"""Test configuration: force the CPU backend with 8 virtual devices.

Unit tests must run without TPU hardware; sharded code paths are validated
on a virtual 8-device CPU mesh (the driver separately dry-runs the
multi-chip path on N virtual devices). The environment's sitecustomize may
pin JAX_PLATFORMS to a TPU plugin, so the platform is also overridden
programmatically before any computation runs.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# SEPARATE persistent-cache directory for the CPU test runs: sharing the
# TPU harness's cache poisoned it with CPU executables whose recorded
# machine features (+prefer-no-scatter etc.) mismatch at load time —
# jax's cache DESERIALIZATION then segfaults (cpu_aot_loader feature
# check, observed killing full-suite runs mid-way).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/pointclouds_tpu_jax_cputests"),
)


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="run tests marked slow (multi-minute scale validation)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute scale validation (use --runslow)"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    import pytest

    skip = pytest.mark.skip(reason="slow scale test: pass --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
