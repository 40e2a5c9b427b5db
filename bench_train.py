"""Training-throughput benchmark: flagship (Deformable-DETR multi-frame
tracking) train step/s at batch 2, 666px (the reference's training
max_size, cfgs/train.yaml:120-122), bf16 mixed precision on one chip.

The reference logs per-iteration time in its train loop
(util/misc.py:198-271); this is the TPU equivalent, measured with the same
anti-distortion rules as bench.py: K steps chained inside ONE jit (the
optimizer state threads the dependency), inputs varied per step via roll.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is null: the reference commits no training-throughput number
(SURVEY §6 — only the 7-GPU setup is documented).
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

ITERS = 5


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from kinet_tpu.config import load_config
    from kinet_tpu.engine.state import TrainState, build_optimizer
    from kinet_tpu.engine.train_step import make_train_step
    from kinet_tpu.models.build import build_model
    from kinet_tpu.structs import ImageBatch, Targets

    cfg = load_config(
        "train.yaml",
        named=["train_deformable", "train_tracking", "train_multi_frame"],
    ).replace(dataset="mot", compute_dtype="bfloat16", remat=True)
    model, criterion, _ = build_model(cfg)

    b, h, w, n_obj = 2, 672, 1184, 20  # ≙ reference train max_size 666
    t = int(cfg.max_track_queries)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)

    def make(k, tid0):
        images = jax.random.normal(k, (b, h, w, 3), jnp.float32)
        boxes = jax.random.uniform(k, (b, n_obj, 4), minval=0.2, maxval=0.6)
        tids = jnp.broadcast_to(
            jnp.arange(tid0, tid0 + n_obj, dtype=jnp.int32)[None], (b, n_obj)
        )
        targets = Targets.create(
            boxes, jnp.zeros((b, n_obj), jnp.int32),
            jnp.ones((b, n_obj), bool), track_ids=tids,
            num_track_queries=t, hidden_dim=int(cfg.hidden_dim),
        )
        return ImageBatch(
            images=images, pad_mask=jnp.zeros((b, h, w), bool)
        ), targets

    batch, targets = make(k1, 0)
    prev_batch, prev_targets = make(k2, 0)

    params = jax.jit(model.init)(k3, batch, targets)
    tx = build_optimizer(cfg, params, steps_per_epoch=1000)
    state = TrainState.create(params, tx)
    step = make_train_step(model, criterion, tx, cfg)

    @jax.jit
    def run_steps(state, rng, batch, targets, prev_batch, prev_targets):
        def one(carry, i):
            st = carry
            fb = batch.replace(images=jnp.roll(batch.images, i, axis=2))
            pb = prev_batch.replace(
                images=jnp.roll(prev_batch.images, i, axis=2)
            )
            st, losses = step(st, rng, fb, targets, pb, prev_targets)
            return st, losses["loss"]

        state, losses = jax.lax.scan(
            one, state, jnp.arange(ITERS, dtype=jnp.int32)
        )
        return losses

    t0 = time.perf_counter()
    losses = run_steps(
        state, jax.random.PRNGKey(7), batch, targets, prev_batch, prev_targets
    )
    jax.block_until_ready(losses)
    log(f"compile + first run: {time.perf_counter() - t0:.1f}s")
    log(f"losses: {[round(float(x), 3) for x in losses]}")

    t0 = time.perf_counter()
    losses = run_steps(
        state, jax.random.PRNGKey(7), batch, targets, prev_batch, prev_targets
    )
    jax.block_until_ready(losses)
    dt = time.perf_counter() - t0
    sps = ITERS / dt

    print(
        json.dumps(
            {
                "metric": "mot17_666px_flagship_train_step",
                "value": round(sps, 4),
                "unit": "steps/sec/chip (batch 2)",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception:
        import traceback

        traceback.print_exc()
        print(
            json.dumps(
                {
                    "metric": "mot17_666px_flagship_train_step",
                    "value": 0.0,
                    "unit": "steps/sec/chip (batch 2)",
                    "vs_baseline": None,
                }
            )
        )
        sys.exit(0)
