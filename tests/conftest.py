"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on a fake mesh
(``--xla_force_host_platform_device_count=8``) because only one physical TPU
chip is attached; the driver separately dry-runs the multi-chip path via
``__graft_entry__.dryrun_multichip``.
"""

import os

# Must run before any jax backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms before the env var is read;
# override it explicitly so tests never run through the TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
