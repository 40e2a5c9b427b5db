"""Interleaved multi-sequence tracking probe: B concurrent sequences
stepped as B SINGLE-STREAM (B=1) model.apply calls inside ONE jitted scan
step, outputs stacked. Hypothesis (VERDICT r3 #1): each subgraph keeps the
optimal B=1 lowering (fast-tier tables, no T(2,128) relayouts) and XLA
interleaves the independent chains, so aggregate beats both single-stream
(dispatch amortization + cross-chain ILP) and the stacked-batch form
(which pays ~7 ms/frame of layout copies at 800x1440 B=2).

PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_interleaved_track.py [B ...]
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

from kinet_tpu.config import load_config
from kinet_tpu.models.build import build_model
from kinet_tpu.structs import ImageBatch, Targets


def bench_batch(model, cfg, b: int, iters: int = 10) -> float:
    h = int(os.environ.get("BENCH_H", "800"))
    w = int(os.environ.get("BENCH_W", "1440"))
    n_track = int(cfg.max_track_queries)
    key = jax.random.PRNGKey(0)
    images = jax.random.normal(key, (b, h, w, 3), jnp.float32)
    batch = ImageBatch(images=images, pad_mask=jnp.zeros((b, h, w), bool))
    targets = Targets.create(
        jnp.full((b, 1, 4), 0.5),
        jnp.zeros((b, 1), jnp.int32),
        jnp.zeros((b, 1), bool),
        num_track_queries=n_track,
        hidden_dim=int(cfg.hidden_dim),
    ).replace(
        track_query_mask=jnp.broadcast_to(
            jnp.arange(n_track)[None] < 20, (b, n_track)
        ),
        track_query_embeds=jax.random.normal(
            key, (b, n_track, int(cfg.hidden_dim))
        ),
        track_query_boxes=jnp.full((b, n_track, 4), 0.4),
    )

    t0 = time.perf_counter()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(1),
        jax.tree_util.tree_map(lambda x: x[:1], batch),
        jax.tree_util.tree_map(lambda x: x[:1], targets),
    )
    jax.block_until_ready(params)
    print(f"B={b} init: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        params,
    )
    batch = batch.replace(images=batch.images.astype(jnp.bfloat16))
    targets = targets.replace(
        track_query_embeds=targets.track_query_embeds.astype(jnp.bfloat16)
    )

    def row(tree, e):
        return jax.tree_util.tree_map(lambda x: x[e : e + 1], tree)

    @jax.jit
    def fwd_once(params, batch, targets):
        outs = [
            model.apply(params, row(batch, e), row(targets, e))
            for e in range(b)
        ]
        mems = [o["frame_memory"] for o in outs]
        poss = [o["pos_cache"] for o in outs]
        return mems, poss

    @jax.jit
    def run_frames(params, batch, targets, memories, pos_caches):
        def one_frame(carry, step):
            frame = batch.replace(images=jnp.roll(batch.images, step, axis=2))
            new_mems, tot = [], jnp.float32(0)
            for e in range(b):
                out = model.apply(
                    params, row(frame, e), row(targets, e),
                    prev_memory=carry[e], pos_cache=pos_caches[e],
                )
                new_mems.append(out["frame_memory"])
                tot = tot + jnp.sum(out["pred_boxes"])
            return tuple(new_mems), tot

        _, sums = jax.lax.scan(
            one_frame, tuple(memories), jnp.arange(iters, dtype=jnp.int32)
        )
        return jnp.sum(sums)

    t0 = time.perf_counter()
    mems, poss = fwd_once(params, batch, targets)
    jax.block_until_ready(mems)
    print(f"B={b} compile fwd: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    s = float(run_frames(params, batch, targets, mems, poss))
    print(f"B={b} compile scan: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s = float(run_frames(params, batch, targets, mems, poss))
        dt = min(dt, time.perf_counter() - t0)
    fps = iters * b / dt
    print(f"B={b} interleaved: {fps:.2f} frames/s aggregate ({fps / b:.2f}/seq)  checksum {s:.1f}")
    return fps


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [2]
    cfg = load_config(
        "train.yaml",
        named=["train_deformable", "train_tracking", "train_multi_frame"],
    ).replace(dataset="mot", dropout=0.0)
    model, _, _ = build_model(cfg)
    for b in sizes:
        bench_batch(model, cfg, b)


if __name__ == "__main__":
    main()
