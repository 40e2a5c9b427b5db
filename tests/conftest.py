"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax initializes its backends.
"""
import os

# force-assign: the environment presets JAX_PLATFORMS=axon (real TPU tunnel)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
