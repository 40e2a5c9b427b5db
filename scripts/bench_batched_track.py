"""Aggregate-throughput benchmark: the flagship tracking forward stepped
with B concurrent sequences (BatchedTracker's device path) at 800px.

Same harness as bench.py (K chained cached frames inside one jitted scan,
best-of-3) but with a batch dimension: reports per-batch-size aggregate
frames/sec/chip. Run: PYTHONPATH=/root/repo:/root/.axon_site python
scripts/bench_batched_track.py [B ...]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from kinet_tpu.config import load_config
from kinet_tpu.models.build import build_model
from kinet_tpu.structs import ImageBatch, Targets


def bench_batch(model, cfg, b: int, iters: int = 10) -> float:
    import os
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
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch, targets)
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

    @jax.jit
    def fwd_once(params, batch, targets):
        out = model.apply(params, batch, targets)
        return out["frame_memory"], out["pos_cache"]

    @jax.jit
    def run_frames(params, batch, targets, memory, pos_cache):
        def one_frame(carry, step):
            frame = batch.replace(images=jnp.roll(batch.images, step, axis=2))
            out = model.apply(
                params, frame, targets, prev_memory=carry, pos_cache=pos_cache
            )
            return out["frame_memory"], jnp.sum(out["pred_boxes"])

        memory, sums = jax.lax.scan(
            one_frame, memory, jnp.arange(iters, dtype=jnp.int32)
        )
        return jnp.sum(sums)

    t0 = time.perf_counter()
    feats, pos_cache = fwd_once(params, batch, targets)
    jax.block_until_ready(feats)
    print(f"B={b} compile fwd: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    s = float(run_frames(params, batch, targets, feats, pos_cache))
    print(f"B={b} compile scan: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s = float(run_frames(params, batch, targets, feats, pos_cache))
        dt = min(dt, time.perf_counter() - t0)
    fps = iters * b / dt
    print(f"B={b}: {fps:.2f} frames/s aggregate ({fps / b:.2f}/seq)  checksum {s:.1f}")
    return fps


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    cfg = load_config(
        "train.yaml",
        named=["train_deformable", "train_tracking", "train_multi_frame"],
    ).replace(dataset="mot", dropout=0.0)
    model, _, _ = build_model(cfg)
    for b in sizes:
        bench_batch(model, cfg, b)


if __name__ == "__main__":
    main()
