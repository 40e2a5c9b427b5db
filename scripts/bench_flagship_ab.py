"""A/B the flagship frame time across config overrides in ONE process
(device throughput varies ~2x run-to-run; only same-process ratios are
trustworthy). Same harness as bench.py: K frames chained through the cached
prev memory inside one jit, image rolled per step."""
import json
import sys
import time

import jax
import jax.numpy as jnp

from kinet_tpu.config import load_config
from kinet_tpu.models.build import build_model
from kinet_tpu.structs import ImageBatch, Targets

ITERS = 10


def bench_one(overrides: dict) -> float:
    overrides.setdefault("allow_lossy", True)  # probing lossy variants is
    # the point of this script; build_model gates them otherwise
    cfg = load_config(
        "train.yaml",
        named=["train_deformable", "train_tracking", "train_multi_frame"],
    ).replace(dataset="mot", dropout=0.0, **overrides)
    model, _, _ = build_model(cfg)
    b, h, w = 1, 800, 1440
    n_track = int(cfg.max_track_queries)
    key = jax.random.PRNGKey(0)
    images = jax.random.normal(key, (b, h, w, 3), jnp.float32)
    batch = ImageBatch(images=images, pad_mask=jnp.zeros((b, h, w), bool))
    targets = Targets.create(
        jnp.full((b, 1, 4), 0.5), jnp.zeros((b, 1), jnp.int32),
        jnp.zeros((b, 1), bool), num_track_queries=n_track,
        hidden_dim=int(cfg.hidden_dim),
    ).replace(
        track_query_mask=jnp.arange(int(cfg.max_track_queries))[None] < 20,
        track_query_embeds=jax.random.normal(
            key, (b, n_track, int(cfg.hidden_dim))
        ).astype(jnp.bfloat16),
        track_query_boxes=jnp.full((b, n_track, 4), 0.4),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch, targets)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        params,
    )
    batch = batch.replace(images=batch.images.astype(jnp.bfloat16))

    first = jax.jit(
        lambda p, ba, t_: model.apply(p, ba, t_)["frame_memory"]
    )
    mem = first(params, batch, targets)

    @jax.jit
    def run_frames(params, batch, targets, memory):
        def one_frame(carry, step):
            frame = batch.replace(images=jnp.roll(batch.images, step, axis=2))
            out = model.apply(params, frame, targets, prev_memory=carry)
            return out["frame_memory"], jnp.sum(out["pred_boxes"])

        memory, sums = jax.lax.scan(
            one_frame, memory, jnp.arange(ITERS, dtype=jnp.int32)
        )
        return jnp.sum(sums)

    float(run_frames(params, batch, targets, mem))  # compile + 1st run
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_frames(params, batch, targets, mem))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return 1.0 / best


def main():
    variants = json.loads(sys.argv[1]) if len(sys.argv) > 1 else [
        {"enc_msda_topk": 0},
        {"enc_msda_topk": 8},
        {"enc_msda_topk": 4},
    ]
    for over in variants:
        fps = bench_one(over)
        print(f"{json.dumps(over):50s} {fps:6.3f} fps", flush=True)


if __name__ == "__main__":
    main()
