"""VERDICT r4 #8: measure the collectives XLA actually inserts for the
spatial-parallel (sp) forward, instead of the ~13 MB/frame docstring guess.

Compiles parallel/sp.py's height-sharded flagship-family forward on an
8-virtual-device CPU mesh and tabulates every collective op in the
optimized HLO with its payload bytes. Run:

  python scripts/probe_sp_collectives.py          # (re-execs itself w/ env)
"""
from __future__ import annotations

import os
import re
import sys


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from kinet_tpu.config import load_config
    from kinet_tpu.models.build import build_model
    from kinet_tpu.parallel.mesh import make_mesh
    from kinet_tpu.parallel.sp import spatial_place
    from kinet_tpu.structs import ImageBatch, Targets

    n = len(jax.devices())
    assert n >= 8, f"need 8 virtual devices, got {n}"

    # flagship family at reduced-but-representative resolution (the HLO
    # collective STRUCTURE is resolution-independent; bytes scale with area)
    cfg = load_config(
        "train.yaml",
        named=["train_deformable", "train_tracking", "train_multi_frame"],
    ).replace(dataset="mot", dropout=0.0, backbone="resnet_test")
    h, w = 256, 384
    model, _, _ = build_model(cfg)
    tq = int(cfg.max_track_queries)
    hd = int(cfg.hidden_dim)
    batch = ImageBatch(
        images=jnp.zeros((1, h, w, 3)), pad_mask=jnp.zeros((1, h, w), bool)
    )
    targets = Targets.create(
        jnp.full((1, 1, 4), 0.5), jnp.zeros((1, 1), jnp.int32),
        jnp.zeros((1, 1), bool), num_track_queries=tq, hidden_dim=hd,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch, targets)

    mesh = make_mesh(n_data=8, n_model=1)
    placed = spatial_place(mesh, batch)
    from jax.sharding import NamedSharding, PartitionSpec as P

    params_r = jax.device_put(params, NamedSharding(mesh, P()))
    targets_r = jax.device_put(targets, NamedSharding(mesh, P()))

    # the same jit make_spatial_apply wraps (parallel/sp.py:63-64), lowered
    # directly so the optimized HLO is inspectable
    rep = NamedSharding(mesh, P())
    fwd = jax.jit(model.apply, out_shardings=rep)
    with mesh:
        lowered = fwd.lower(params_r, placed, targets_r, deterministic=True)
        compiled = lowered.compile()
    hlo = compiled.as_text()

    dtype_bytes = {
        "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
        "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8,
    }

    def shape_bytes(sig: str) -> int:
        # e.g. "f32[1,32,48,288]" or tuple "(f32[...], f32[...])"
        total = 0
        for m in re.finditer(r"(\w+)\[([\d,]*)\]", sig):
            dt, dims = m.group(1), m.group(2)
            if dt not in dtype_bytes:
                continue
            size = 1
            if dims:
                for d in dims.split(","):
                    size *= int(d)
            total += size * dtype_bytes[dt]
        return total

    kinds = (
        "all-gather", "all-reduce", "collective-permute", "reduce-scatter",
        "all-to-all",
    )
    per_kind: dict[str, list[int]] = {k: [] for k in kinds}
    for line in hlo.splitlines():
        ls = line.strip()
        m = re.match(r"\S+ = (\([^)]*\)|\S+) (\S+)\(", ls)
        if not m:
            continue
        op = m.group(2).rstrip(".0123456789")
        for k in kinds:
            if op.startswith(k):
                per_kind[k].append(shape_bytes(m.group(1)))

    total = 0
    print(f"sp forward collectives at {h}x{w} (8-way height sharding):")
    for k, sizes in per_kind.items():
        if not sizes:
            continue
        s = sum(sizes)
        total += s
        print(
            f"  {k:20s} x{len(sizes):3d}  {s / 1e6:8.2f} MB "
            f"(max {max(sizes) / 1e6:.2f} MB)"
        )
    print(f"  TOTAL payload: {total / 1e6:.2f} MB per frame at {h}x{w}")
    area_scale = (800 * 1440) / (h * w)
    print(
        f"  scaled to 800x1440 (xA {area_scale:.1f} on the resolution-bound"
        f" terms): <= {total * area_scale / 1e6:.1f} MB/frame upper bound"
    )


if __name__ == "__main__":
    if os.environ.get("_KINET_SP_PROBE_CHILD"):
        main()
    else:
        import subprocess

        env = dict(os.environ)
        env["_KINET_SP_PROBE_CHILD"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        flags = " ".join(
            f
            for f in env.get("XLA_FLAGS", "").split()
            if "host_platform_device_count" not in f
        )
        env["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count=8".strip()
        )
        sys.exit(
            subprocess.run([sys.executable, os.path.abspath(__file__)], env=env).returncode
        )
