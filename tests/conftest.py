"""Test config: force JAX onto a virtual 8-device CPU mesh.

Tests must be hermetic and fast; multi-chip sharding is validated on host CPU
devices (the driver separately dry-runs __graft_entry__.dryrun_multichip on
real topology). Note: this environment's sitecustomize pre-imports jax and
registers a TPU plugin, so env vars alone are too late — we must go through
jax.config.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
