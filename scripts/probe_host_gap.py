"""VERDICT r4 #5: prove (or fix) the per-frame host-gap attribution.

bench.py's per-frame-dispatch mode measures ~26 ms/frame of "host" time on
top of ~22 ms device time. PLAN attributes it to the remote-tunnel RTT.
This probe gives that claim a measured basis by varying, per frame:

  A. pure RTT floor: a trivial jit (1-element add) + scalar fetch
  B. flagship frame + 1 scalar fetch            (bench.py dispatch mode)
  C. flagship frame + live-Tracker fetch: 4 per-key np.asarray transfers
     (scores/labels/boxes/hs_embed rows)         (tracker.py _ROW_KEYS)
  D. same rows, ONE batched jax.device_get
  E. top-K-reduced rows (device-side gather of the 80 rows the state
     machine can actually consume), one device_get
  F. flagship frame + 2 scalar fetches           (RTT scaling check)

Run on the real chip: PYTHONPATH=/root/repo:/root/.axon_site python
scripts/probe_host_gap.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(fn, n=5, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3  # ms


def main():
    from kinet_tpu.config import load_config
    from kinet_tpu.models.build import build_model
    from kinet_tpu.structs import ImageBatch, Targets

    cfg = load_config(
        "train.yaml",
        named=["train_deformable", "train_tracking", "train_multi_frame"],
    ).replace(dataset="mot", dropout=0.0, dec_msda_int8=True, allow_lossy=True)
    model, _, _ = build_model(cfg)

    b, h, w = 1, 800, 1440
    n_track = int(cfg.max_track_queries)
    hidden = int(cfg.hidden_dim)
    key = jax.random.PRNGKey(0)
    images = jax.random.normal(key, (b, h, w, 3), jnp.float32)
    batch = ImageBatch(images=images, pad_mask=jnp.zeros((b, h, w), bool))
    targets = Targets.create(
        jnp.full((b, 1, 4), 0.5), jnp.zeros((b, 1), jnp.int32),
        jnp.zeros((b, 1), bool),
        num_track_queries=n_track, hidden_dim=hidden,
    ).replace(
        track_query_mask=jnp.arange(n_track)[None] < 20,
        track_query_embeds=jax.random.normal(key, (b, n_track, hidden)),
        track_query_boxes=jnp.full((b, n_track, 4), 0.4),
    )

    t0 = time.perf_counter()
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch, targets)
    jax.block_until_ready(params)
    log(f"init: {time.perf_counter() - t0:.1f}s")
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    batch = batch.replace(images=batch.images.astype(jnp.bfloat16))
    targets = targets.replace(
        track_query_embeds=targets.track_query_embeds.astype(jnp.bfloat16))

    # ---- A: RTT floor ----
    @jax.jit
    def noop(x):
        return x + 1.0

    x = jnp.zeros(())
    float(noop(x))
    a = timeit(lambda: float(noop(x)), n=20)
    log(f"A  RTT floor (trivial jit + scalar fetch): {a:.2f} ms")

    # ---- flagship one-frame graphs ----
    @jax.jit
    def frame_scalar(params, batch, targets, memory, pos_cache):
        out = model.apply(params, batch, targets, prev_memory=memory,
                          pos_cache=pos_cache)
        return out["frame_memory"], jnp.sum(out["pred_boxes"])

    @jax.jit
    def frame_rows(params, batch, targets, memory, pos_cache):
        # what the live tracker consumes: postprocessed rows
        out = model.apply(params, batch, targets, prev_memory=memory,
                          pos_cache=pos_cache)
        probs = jax.nn.sigmoid(out["pred_logits"].astype(jnp.float32))
        scores = probs.max(-1)
        labels = probs.argmax(-1)
        return out["frame_memory"], {
            "scores": scores, "labels": labels,
            "boxes": out["pred_boxes"].astype(jnp.float32),
            "hs_embed": out["hs_embed"].astype(jnp.float32),
        }

    @jax.jit
    def frame_topk(params, batch, targets, memory, pos_cache, k=60):
        # device-side reduction to the rows the state machine can consume:
        # all track slots + top-k object-query rows by score
        out = model.apply(params, batch, targets, prev_memory=memory,
                          pos_cache=pos_cache)
        probs = jax.nn.sigmoid(out["pred_logits"].astype(jnp.float32))
        scores = probs.max(-1)
        labels = probs.argmax(-1)
        boxes = out["pred_boxes"].astype(jnp.float32)
        hs = out["hs_embed"].astype(jnp.float32)
        t = n_track
        obj_scores = scores[:, t:]
        _, idx = jax.lax.top_k(obj_scores, k)
        sel = jnp.concatenate(
            [jnp.broadcast_to(jnp.arange(t)[None], (b, t)), idx + t], axis=1)
        take = lambda a: jnp.take_along_axis(
            a, sel.reshape(b, -1, *([1] * (a.ndim - 2))), axis=1)
        return out["frame_memory"], {
            "scores": jnp.take_along_axis(scores, sel, 1),
            "labels": jnp.take_along_axis(labels, sel, 1),
            "boxes": take(boxes), "hs_embed": take(hs), "sel": sel,
        }

    # warm pos/memory caches
    out0 = jax.jit(lambda p, b_, t_: model.apply(p, b_, t_))(
        params, batch, targets)
    memory = out0["frame_memory"]
    pos_cache = out0["pos_cache"]

    mem, chk = frame_scalar(params, batch, targets, memory, pos_cache)
    float(chk)
    bms = timeit(lambda: float(frame_scalar(
        params, batch, targets, memory, pos_cache)[1]))
    log(f"B  flagship + 1 scalar fetch: {bms:.2f} ms")

    _, rows = frame_rows(params, batch, targets, memory, pos_cache)
    jax.block_until_ready(rows)
    import numpy as np

    def fetch_live():
        _, r = frame_rows(params, batch, targets, memory, pos_cache)
        return {k: np.asarray(r[k][0]) for k in
                ("scores", "labels", "boxes", "hs_embed")}

    fetch_live()
    cms = timeit(fetch_live)
    nbytes = sum(np.asarray(v[0]).nbytes for v in rows.values())
    log(f"C  flagship + per-key np.asarray rows ({nbytes/1e3:.0f} KB): "
        f"{cms:.2f} ms")

    def fetch_batched():
        _, r = frame_rows(params, batch, targets, memory, pos_cache)
        return jax.device_get(r)

    fetch_batched()
    dms = timeit(fetch_batched)
    log(f"D  flagship + ONE device_get (same rows): {dms:.2f} ms")

    _, rk = frame_topk(params, batch, targets, memory, pos_cache)
    jax.block_until_ready(rk)
    kbytes = sum(np.asarray(v[0]).nbytes for v in rk.values())

    def fetch_topk():
        _, r = frame_topk(params, batch, targets, memory, pos_cache)
        return jax.device_get(r)

    fetch_topk()
    ems = timeit(fetch_topk)
    log(f"E  flagship + top-K rows, one device_get ({kbytes/1e3:.0f} KB): "
        f"{ems:.2f} ms")

    def fetch_two_scalars():
        m, c = frame_scalar(params, batch, targets, memory, pos_cache)
        float(c)
        float(noop(x))

    fetch_two_scalars()
    fms = timeit(fetch_two_scalars)
    log(f"F  flagship + 2 sequential scalar round-trips: {fms:.2f} ms")

    log("--- interpretation ---")
    log(f"RTT floor {a:.1f} ms; extra per additional round-trip "
        f"{fms - bms:.1f} ms; bytes effect (C vs B at {nbytes/1e3:.0f} KB): "
        f"{cms - bms:.1f} ms; batching fetches saves {cms - dms:.1f} ms; "
        f"top-K row cut saves {dms - ems:.1f} ms further")


if __name__ == "__main__":
    main()
