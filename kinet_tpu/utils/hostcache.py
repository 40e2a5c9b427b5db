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


# Per-CPU-index / frequency lines that differ across otherwise-identical
# hosts (or across boots) without affecting generated code:
_VOLATILE_KEYS = frozenset(
    {"processor", "cpu MHz", "bogomips", "apicid", "initial apicid",
     "core id", "physical id", "BogoMIPS"}
)


def _cpu_fingerprint(cpuinfo_path: str = "/proc/cpuinfo") -> str:
    # Hash the ENTIRE first /proc/cpuinfo block (minus volatile keys), not a
    # hand-picked subset. Observed failure of the old subset (model name /
    # stepping / microcode / flags): cloud VMs normalize all four (generic
    # "Intel(R) Xeon(R) Processor" model name, microcode 0x1) while the
    # numeric `cpu family` / `model` lines — which are what LLVM keys its
    # subtarget tuning off (e.g. +prefer-no-gather on Sapphire vs Emerald
    # Rapids) — differ. Two such hosts collided to one cache dir and the
    # second host loaded AOT code with unsupported tuning features.
    bits = [platform.machine()]
    try:
        with open(cpuinfo_path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    break  # end of the first processor block
                key, _, val = line.partition(":")
                key = key.strip()
                if key in _VOLATILE_KEYS:
                    continue
                if key in ("flags", "Features", "bugs", "vmx flags"):
                    # sort: ordering is kernel-version noise
                    val = " ".join(sorted(val.split()))
                bits.append(f"{key}={val.strip()}")
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
