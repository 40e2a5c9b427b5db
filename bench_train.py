"""Training-throughput benchmark: flagship (Deformable-DETR multi-frame
tracking) train step/s at batch 1, 666px (the reference's training
max_size, cfgs/train.yaml:120-122), bf16 mixed precision on one chip.

The reference logs per-iteration time in its train loop
(util/misc.py:198-271); this is the TPU equivalent. A lax.scan over the
train step crashes the worker at this scale (the carried optimizer state
doubles the peak), so K steps are dispatched sequentially with the state
threaded through (each step depends on the last) and the measurement is
closed by fetching a SCALAR computed from the final state — an actual
value transfer cannot return early the way block_until_ready does through
the axon tunnel.

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

ITERS = int(__import__("os").environ.get("BT_ITERS", "5"))


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

    # batch 1 default. Per-image throughput is near-linear in batch on one
    # v5e chip after the r4 batch-aware MSDA work: B1 6.83 / B2 6.54 / B4
    # 6.40 img/s (94% batch efficiency at B4, was 72% in r3). Roofline:
    # the train step is dominated by MSDA gather rows + backward
    # scatter-adds, both of which scale linearly in batch (no idle
    # capacity for batching to absorb), so ~94% is the expected ceiling —
    # DP multi-chip training at per-chip batch >1 now loses ~nothing.
    # The reference uses batch 2 x 7 GPUs (docs/TRAIN.md:119).
    b = int(__import__("os").environ.get("BT_BATCH", "1"))
    h, w, n_obj = 672, 1184, 20  # ≙ reference train max_size 666
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

    rng = jax.random.PRNGKey(7)

    def fetch(st):
        # force completion via a real value transfer
        leaf = jax.tree_util.tree_leaves(st.params)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    t0 = time.perf_counter()
    state, losses = step(
        state, rng, batch, targets, prev_batch, prev_targets
    )
    first_loss = float(losses["loss"])
    log(f"compile + first step: {time.perf_counter() - t0:.1f}s "
        f"loss={first_loss:.3f}")

    # best-of-3: the remote-tunnel dispatch rate occasionally degrades an
    # order of magnitude for a stretch (observed 0.47 vs 5.5 steps/s on
    # back-to-back runs); min time is the stable estimator
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, losses = step(
                state, rng, batch, targets, prev_batch, prev_targets
            )
        fetch(state)
        dt = min(dt, time.perf_counter() - t0)
    sps = ITERS / dt
    log(f"final loss: {float(losses['loss']):.3f}")

    print(
        json.dumps(
            {
                "metric": "mot17_666px_flagship_train_step",
                "value": round(sps, 4),
                "unit": f"steps/sec/chip (batch {b})",
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
                    "unit": "steps/sec/chip (batch 1)",
                    "vs_baseline": None,
                }
            )
        )
        sys.exit(0)
