"""Full-res (1080x1920, cfgs/train_full_res.yaml ≙ reference
cfgs/train_full_res.yaml) robustness probe on one chip: flagship
inference fps (cached-frame scan, same harness as bench.py) and one
train step — proves the memory/bucketing behavior at 1080p (VERDICT r3
#8). PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_full_res.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from kinet_tpu.config import load_config
from kinet_tpu.models.build import build_model
from kinet_tpu.structs import ImageBatch, Targets


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    cfg = load_config(
        "train.yaml",
        named=["train_deformable", "train_tracking", "train_multi_frame",
               "train_full_res"],
    ).replace(dataset="mot", dropout=0.0)
    model, criterion, _ = build_model(cfg)
    b, h, w = 1, 1080, 1920
    n_track = int(cfg.max_track_queries)
    key = jax.random.PRNGKey(0)
    batch = ImageBatch(
        images=jax.random.normal(key, (b, h, w, 3), jnp.float32),
        pad_mask=jnp.zeros((b, h, w), bool),
    )
    targets = Targets.create(
        jnp.full((b, 1, 4), 0.5), jnp.zeros((b, 1), jnp.int32),
        jnp.zeros((b, 1), bool), num_track_queries=n_track,
        hidden_dim=int(cfg.hidden_dim),
    ).replace(
        track_query_mask=jnp.arange(n_track)[None] < 20,
        track_query_embeds=jax.random.normal(
            key, (b, n_track, int(cfg.hidden_dim))
        ),
        track_query_boxes=jnp.full((b, n_track, 4), 0.4),
    )

    t0 = time.perf_counter()
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch, targets)
    jax.block_until_ready(params)
    log(f"init: {time.perf_counter() - t0:.1f}s")
    params_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params,
    )
    bb = batch.replace(images=batch.images.astype(jnp.bfloat16))
    tt = targets.replace(
        track_query_embeds=targets.track_query_embeds.astype(jnp.bfloat16)
    )

    ITERS = 8

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
            one_frame, memory, jnp.arange(ITERS, dtype=jnp.int32)
        )
        return jnp.sum(sums)

    t0 = time.perf_counter()
    mem, pos = fwd_once(params_bf16, bb, tt)
    jax.block_until_ready(mem)
    log(f"compile fwd: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    s = float(run_frames(params_bf16, bb, tt, mem, pos))
    log(f"compile scan: {time.perf_counter() - t0:.1f}s")
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s = float(run_frames(params_bf16, bb, tt, mem, pos))
        dt = min(dt, time.perf_counter() - t0)
    print(
        f"full-res 1080x1920 inference: {ITERS / dt:.2f} frames/s/chip "
        f"(checksum {s:.1f})"
    )

    # one train step (fp32 params, 2-frame tracking step like bench_train)
    from kinet_tpu.engine.state import TrainState, build_optimizer
    from kinet_tpu.engine.train_step import make_train_step

    n_obj = 20
    k2 = jax.random.PRNGKey(2)
    boxes = jax.random.uniform(k2, (b, n_obj, 4), minval=0.2, maxval=0.6)
    tg = Targets.create(
        boxes, jnp.zeros((b, n_obj), jnp.int32), jnp.ones((b, n_obj), bool),
        track_ids=jnp.broadcast_to(jnp.arange(n_obj)[None], (b, n_obj)),
        num_track_queries=n_track, hidden_dim=int(cfg.hidden_dim),
    )
    tx = build_optimizer(cfg, params, steps_per_epoch=100)
    state = TrainState.create(params, tx)
    step = make_train_step(model, criterion, tx, cfg)
    t0 = time.perf_counter()
    state, losses = step(
        state, jax.random.PRNGKey(3), batch, tg, batch, tg
    )
    loss = float(losses["loss"])
    log(f"train step compile+run: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    state, losses = step(state, jax.random.PRNGKey(4), batch, tg, batch, tg)
    loss = float(losses["loss"])
    dt = time.perf_counter() - t0
    print(
        f"full-res 1080x1920 train step: {1 / dt:.2f} steps/s/chip "
        f"(loss {loss:.3f})"
    )


if __name__ == "__main__":
    main()
