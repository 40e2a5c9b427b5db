"""Driver-contract regression tests for __graft_entry__.py.

The round-1 driver run failed because dryrun_multichip assumed the virtual
CPU mesh env was already set; standalone, jax initialized the (single-chip
axon) backend first. The contract: `python -c "import __graft_entry__ as g;
g.dryrun_multichip(8)"` must pass with JAX_PLATFORMS=axon preset and no
conftest. We exercise exactly that invocation in a clean subprocess.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_standalone():
    env = dict(os.environ)
    # simulate the driver environment: axon preset, no CPU mesh flags
    env["JAX_PLATFORMS"] = "axon"
    env.pop("_KINET_DRYRUN_CHILD", None)
    env["XLA_FLAGS"] = ""
    env["PYTHONPATH"] = REPO
    # reuse the suite's persistent compile cache in the child
    # (machine-fingerprinted — see kinet_tpu/utils/hostcache.py)
    from kinet_tpu.utils.hostcache import cache_dir

    env["JAX_COMPILATION_CACHE_DIR"] = cache_dir()
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
    # n=8 matches the driver's invocation AND shares compiles with any
    # other 8-virtual-device run through the persistent cache — this is
    # the single dryrun executed by the suite (the old second in-process
    # dryrun compiled the same graphs again; VERDICT r2 weak #4)
    proc = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        # cold persistent cache on the 1-core host: ~500s of compiles plus
        # CPU-collective rendezvous stalls; warm runs finish in well under
        # 100s (observed 707s cold under 3-way CPU contention)
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "OK" in proc.stdout, proc.stdout
