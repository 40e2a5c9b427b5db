"""Spatial parallelism (SP): serve ONE stream over N chips.

The reference binds one stream to one GPU (reference src/track.py runs
each sequence's frames serially on the single device), so per-frame
latency has a hard single-device floor. On TPU, GSPMD makes single-frame
spatial partitioning a LAYOUT choice, not a rewrite: shard the image
HEIGHT dim over a mesh axis, keep the parameters replicated, and jit —
XLA spatially partitions the backbone convolutions (halo exchanges over
ICI at each conv), the sharding propagates through flatten into the
token/sequence dim of the encoder (so the per-token MSDA gather chains —
the flagship's latency bound, see PLAN "MFU / roofline accounting" —
split N-ways too), and XLA all-gathers exactly where an op needs a full
tensor. Measured from the compiled HLO (scripts/probe_sp_collectives.py,
docs/PARALLELISM.md): 1 all-gather + 1 all-reduce + 2 conv-halo
collective-permutes, ~1.4 MB/frame at 256x384 (<= ~17 MB/frame scaled
to 800px) — communication is not the limiter; the replicated
decoder/head remainder is (Amdahl).

This is the `sp` point in the dp/tp/sp design space:
- dp (mesh.py): THROUGHPUT — many streams, one per data shard.
- tp (tp.py):   weight memory + matmul FLOPs over `model`.
- sp (here):    LATENCY of one stream — backbone conv FLOPs and the
  per-query gather/attention work split over the spatial/sequence dim;
  the replicated remainder (decoder over Q queries, heads) bounds the
  win (Amdahl).

Validated: tests/test_parallel.py::test_spatial_parallel_forward —
H-sharded forward == replicated forward to float-reorder noise on an
8-device mesh; exercised multi-chip in __graft_entry__.dryrun_multichip.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_place(mesh: Mesh, batch, axis: str = "data"):
    """Place an ImageBatch with its HEIGHT dim sharded over `axis`.

    [B, H, W, 3] images → P(None, axis); [B, H, W] pad mask → same. With
    B=1 this is single-frame spatial partitioning; with B>1 each frame
    in the batch is split the same way (dp×sp composes by also sharding
    dim 0 — pass a 2-tuple axis to images/pad_mask yourself for that).
    """
    sh = NamedSharding(mesh, P(None, axis))
    return batch.replace(
        images=jax.device_put(batch.images, sh),
        pad_mask=jax.device_put(batch.pad_mask, sh),
    )


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params, targets, caches) over the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def make_spatial_apply(model, mesh: Mesh, axis: str = "data"):
    """jit `model.apply` for spatially-partitioned inference.

    Returns `apply(params, batch, targets, **kw)`. Outputs are
    replicated (the tracker consumes whole [B, Q, ...] rows on the
    host). Place the inputs ONCE with `spatial_place` / `replicate` —
    the wrapper places them itself only as a convenience fallback, and
    re-placing committed arrays every frame costs a device copy.
    """
    rep = NamedSharding(mesh, P())
    fwd = jax.jit(model.apply, out_shardings=rep)
    img_sh = NamedSharding(mesh, P(None, axis))

    def apply(params, batch, targets, **kw):
        if batch.images.sharding != img_sh:
            batch = spatial_place(mesh, batch, axis)
        with mesh:
            return fwd(params, batch, targets, **kw)

    return apply
