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


def pytest_collection_modifyitems(session, config, items):
    """Run the multichip-dryrun subprocess test FIRST.

    The dryrun child executes 8-virtual-device CPU collectives whose
    rendezvous stalls (threads starved past the terminate timeout) when the
    1-core host is contended; in round 3 the same dp8 phase measured 25 s
    standalone but erratically 2-5x slower mid-suite (VERDICT r3 weak #4,
    phases logged to /tmp/kinet_dryrun_phases-*.log). Running it before any
    other test gives it the cleanest parent state the suite can offer.
    """
    first = [i for i in items if "test_graft_entry" in i.nodeid]
    rest = [i for i in items if "test_graft_entry" not in i.nodeid]
    items[:] = first + rest
