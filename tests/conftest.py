"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware (the driver
separately dry-runs the multichip path; see __graft_entry__.py).

Note: this image's sitecustomize pre-imports jax with JAX_PLATFORMS=axon, so
the env var alone cannot switch platforms — jax.config.update() can, as long
as no backend has been initialised yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
