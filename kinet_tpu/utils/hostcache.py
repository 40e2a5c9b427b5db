"""Machine-fingerprinted JAX compile-cache directory.

The persistent compile cache stores XLA:CPU AOT results specialized to the
*compiling* host's CPU features. `/tmp` can outlive a machine swap (round
drivers re-attach the same disk to different hosts), and loading an AOT
entry compiled for a different microarchitecture can SIGILL/abort the
process (observed: `cpu_aot_loader.cc` "+prefer-no-gather is not supported
on the host machine" followed by SIGABRT in a TSL worker thread). JAX keys
cache entries by compiler version but NOT by host CPU features, so the fix
is ours: suffix the cache dir with a fingerprint of the host CPU, giving a
fresh cache per distinct machine.

Import-free of jax on purpose: tests/conftest.py must call this before jax
initializes its backends.
"""
from __future__ import annotations

import glob
import hashlib
import platform

_BASE = "/tmp/kinet_jax_cache"


def _cpu_fingerprint() -> str:
    bits = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    bits.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
                if line.startswith(("model name", "microcode", "stepping")):
                    bits.append(line.split(":", 1)[1].strip())
    except OSError:
        bits.append(platform.processor())
    # LLVM derives tuning features (e.g. +prefer-no-gather/-scatter, set when
    # the GDS "downfall" mitigation is active) from more than cpuid flags; two
    # hosts with identical /proc/cpuinfo flags but different microcode or
    # mitigation status produce incompatible XLA:CPU AOT code (observed:
    # cpu_aot_loader.cc "+prefer-no-gather is not supported on the host
    # machine" on every cache load after a round driver moved /tmp to a new
    # host). Fold the mitigation state in so such hosts get separate caches.
    for vf in sorted(glob.glob("/sys/devices/system/cpu/vulnerabilities/*")):
        try:
            with open(vf) as f:
                bits.append(f"{vf.rsplit('/', 1)[1]}={f.read().strip()}")
        except OSError:
            pass
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:10]


def cache_dir(base: str = _BASE) -> str:
    """Per-machine compile-cache directory path."""
    return f"{base}-{_cpu_fingerprint()}"
