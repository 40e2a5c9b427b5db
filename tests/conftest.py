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

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from kinet_tpu.utils.hostcache import cache_dir  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: the suite's cost is XLA CPU compiles of model
# graphs; caching them across runs cuts repeat runs from minutes to seconds.
# Machine-fingerprinted: stale AOT entries from a different host CPU can
# SIGILL/abort on load (kinet_tpu/utils/hostcache.py).
jax.config.update("jax_compilation_cache_dir", cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
