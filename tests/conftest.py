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
