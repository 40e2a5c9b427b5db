"""Compile-cache machine fingerprint (kinet_tpu/utils/hostcache.py).

Regression for an observed cross-host cache collision: cloud VMs normalize
`model name` ("Intel(R) Xeon(R) Processor @ 2.10GHz"), `microcode` (0x1) and
`stepping` while still differing in the numeric `cpu family`/`model` lines —
which are what LLVM keys XLA:CPU AOT subtarget tuning off (e.g.
+prefer-no-gather). Two such hosts collided to one cache dir and the second
loaded AOT code with unsupported tuning features (cpu_aot_loader.cc errors,
potential SIGILL/SIGABRT). The fingerprint must therefore hash the whole
first cpuinfo block, not a hand-picked subset.
"""
from __future__ import annotations

from kinet_tpu.utils.hostcache import _cpu_fingerprint, cache_dir

_BLOCK = """\
processor\t: 0
vendor_id\t: GenuineIntel
cpu family\t: 6
model\t\t: {model}
model name\t: Intel(R) Xeon(R) Processor @ 2.10GHz
stepping\t: 2
microcode\t: 0x1
cpu MHz\t\t: {mhz}
cache size\t: 266240 KB
flags\t\t: fpu vme sse sse2 avx avx2 avx512f amx_tile amx_int8
bugs\t\t: spectre_v1 spectre_v2
bogomips\t: {bogo}
address sizes\t: 52 bits physical, 57 bits virtual

processor\t: 1
model\t\t: {model}
"""


def _write(tmp_path, name, **kw):
    p = tmp_path / name
    p.write_text(_BLOCK.format(**kw))
    return str(p)


def test_numeric_model_line_changes_fingerprint(tmp_path):
    # Sapphire Rapids (143) vs Emerald Rapids (207): everything the old
    # subset fingerprint captured is identical, only `model` differs.
    a = _write(tmp_path, "a", model=143, mhz="2100.000", bogo="4200.00")
    b = _write(tmp_path, "b", model=207, mhz="2100.000", bogo="4200.00")
    assert _cpu_fingerprint(a) != _cpu_fingerprint(b)


def test_volatile_lines_do_not_change_fingerprint(tmp_path):
    a = _write(tmp_path, "a", model=207, mhz="2100.000", bogo="4200.00")
    b = _write(tmp_path, "b", model=207, mhz="2099.998", bogo="4199.99")
    assert _cpu_fingerprint(a) == _cpu_fingerprint(b)


def test_only_first_block_is_read(tmp_path):
    # the second processor block (differing per-core lines) must be ignored;
    # the blank line terminates parsing
    a = _write(tmp_path, "a", model=207, mhz="2100.000", bogo="4200.00")
    fp = _cpu_fingerprint(a)
    with open(a, "a") as f:
        f.write("model name\t: SOMETHING ELSE\n")
    assert _cpu_fingerprint(a) == fp


def test_cache_dir_uses_fingerprint():
    d = cache_dir(base="/tmp/xyz")
    assert d.startswith("/tmp/xyz-") and len(d.rsplit("-", 1)[1]) == 10
