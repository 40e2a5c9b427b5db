"""Benchmark: flagship (Deformable-DETR multi-frame tracking) per-frame
inference throughput at 800px on one chip — the reference's headline
inference metric (reference src/track.py:211-214 logs num_frames/time Hz).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is computed against 7.4 Hz — the upstream TrackFormer paper's
published single-GPU throughput for this model class (the fork commits no
number of its own, SURVEY §6).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

REFERENCE_GPU_HZ = 7.4


def main():
    from kinet_tpu.config import load_config
    from kinet_tpu.models.build import build_model
    from kinet_tpu.structs import ImageBatch, Targets

    cfg = load_config(
        "train.yaml",
        named=["train_deformable", "train_tracking", "train_multi_frame"],
    ).replace(dataset="mot", dropout=0.0)
    # serving-side int8 decoder quad tables (inference-only rebuild, params
    # unchanged — the same overlay scripts/bench_mota_hard.py BMH_INT8 gates):
    # on the k=2 trained checkpoint the hard-MOTA session is IDENTICAL
    # (MOTA 0.99328 / IDF1 0.83445 exact vs int8, PLAN.md round 5)
    cfg = cfg.replace(dec_msda_int8=True, allow_lossy=True)
    model, _, _ = build_model(cfg)

    # MOT17 at 800px short side (val_width 800 ≙ full-res eval setting)
    b, h, w = 1, 800, 1440
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
    )
    # realistic tracker state: ~20 active track queries
    targets = targets.replace(
        track_query_mask=jnp.arange(n_track)[None] < 20,
        track_query_embeds=jax.random.normal(
            key, (b, n_track, int(cfg.hidden_dim))
        ),
        track_query_boxes=jnp.full((b, n_track, 4), 0.4),
    )

    import sys

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch, targets)
    jax.block_until_ready(params)
    log(f"init: {time.perf_counter() - t0:.1f}s")

    # bf16 inference: params + images in bfloat16 (MXU-native, halves HBM
    # traffic); box/score outputs come back fp32 from the heads
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

    ITERS = 10

    @jax.jit
    def fwd_once(params, batch, targets):
        # first frame of a sequence (prev := current)
        out = model.apply(params, batch, targets)
        return out["frame_memory"], out["pos_cache"]

    @jax.jit
    def run_frames(params, batch, targets, memory, pos_cache):
        # K tracker frames chained through the cached prev-frame encoded
        # memory (what the Tracker does) inside ONE compiled graph: a single
        # dispatch + sync, so remote-tunnel latency and async-dispatch
        # artifacts cannot distort the timing. Everything is a jit ARGUMENT —
        # closures would bake 160MB of params in as XLA constants (compile
        # explosion).
        def one_frame(carry, step):
            # roll the image by the step index: a fresh frame every step, so
            # XLA cannot hoist the (loop-invariant-looking) current-frame
            # backbone + input projections out of the scan
            frame = batch.replace(
                images=jnp.roll(batch.images, step, axis=2)
            )
            out = model.apply(
                params, frame, targets, prev_memory=carry,
                pos_cache=pos_cache,  # per-sequence constant, like Tracker
            )
            return out["frame_memory"], jnp.sum(out["pred_boxes"])

        memory, sums = jax.lax.scan(
            one_frame, memory, jnp.arange(ITERS, dtype=jnp.int32)
        )
        return jnp.sum(sums)

    t0 = time.perf_counter()
    feats, pos_cache = fwd_once(params, batch, targets)
    jax.block_until_ready(feats)
    log(f"compile fwd_once: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    s = float(run_frames(params, batch, targets, feats, pos_cache))
    log(f"compile run_frames (+1st run): {time.perf_counter() - t0:.1f}s")

    # best-of-3: device throughput through the remote tunnel varies a few
    # percent run to run; min time is the stable estimator of the
    # achievable rate (each run is ITERS frames inside one dispatch)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s = float(run_frames(params, batch, targets, feats, pos_cache))
        dt = min(dt, time.perf_counter() - t0)
    log(f"checksum: {s}")
    fps = ITERS * b / dt
    device_ms = dt / ITERS * 1e3  # one dispatch per K frames ≈ device time

    # per-frame-dispatch mode (what the live Tracker pays: one jit call +
    # one scalar sync per frame) — the delta vs the scan is the host gap.
    # NOTE: in this environment the chip is behind a remote tunnel, so
    # host_ms is dominated by the tunnel round-trip — MEASURED: a trivial
    # jit + scalar fetch costs 27 ms, equal to the full host gap
    # (scripts/probe_host_gap.py, PLAN.md round 5). The recurrent tracker
    # state (frame n+1's track queries depend on frame n's outputs) makes
    # this RTT unhideable for a single stream — batch_sequences>1
    # amortizes it (one dispatch per B frames, tracking/batched.py).
    @jax.jit
    def one_frame_call(params, batch, targets, memory, pos_cache):
        out = model.apply(
            params, batch, targets, prev_memory=memory, pos_cache=pos_cache
        )
        return out["frame_memory"], jnp.sum(out["pred_boxes"])

    mem = feats
    mem, chk = one_frame_call(params, batch, targets, mem, pos_cache)
    float(chk)  # compile + settle
    dt1 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            mem, chk = one_frame_call(params, batch, targets, mem, pos_cache)
            float(chk)  # actual value transfer closes each frame
        dt1 = min(dt1, (time.perf_counter() - t0) / 5)
    host_ms = max(dt1 * 1e3 - device_ms, 0.0)
    log(
        f"per-frame dispatch: {dt1 * 1e3:.2f} ms "
        f"(device {device_ms:.2f} + host/dispatch {host_ms:.2f})"
    )

    # MFU / roofline: XLA's own cost model for the compiled K-frame graph.
    # v5e (TPU v5 lite) peaks: 197 TFLOP/s bf16, ~819 GB/s HBM.
    mfu = hbm_util = None
    try:
        ca = run_frames.lower(
            params, batch, targets, feats, pos_cache
        ).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_frame = float(ca.get("flops", 0.0)) / ITERS
        bytes_frame = float(ca.get("bytes accessed", 0.0)) / ITERS
        if flops_frame > 0:
            mfu = flops_frame / (dt / ITERS) / 197e12
        if bytes_frame > 0:
            hbm_util = bytes_frame / (dt / ITERS) / 819e9
        log(
            f"cost model: {flops_frame / 1e9:.1f} GFLOP/frame, "
            f"{bytes_frame / 1e9:.2f} GB/frame -> "
            f"MFU {100 * (mfu or 0):.2f}%, HBM {100 * (hbm_util or 0):.1f}%"
        )
    except Exception as e:  # cost_analysis availability varies by backend
        log(f"cost_analysis unavailable: {e!r}")

    out = {
        "metric": "mot17_800px_flagship_inference",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / REFERENCE_GPU_HZ, 3),
        "device_ms": round(device_ms, 2),
        "host_ms": round(host_ms, 2),
    }
    if mfu is not None:
        out["mfu"] = round(mfu, 4)
    if hbm_util is not None:
        out["hbm_util"] = round(hbm_util, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # remote compile/runtime hiccup: still emit a
        # well-formed line so the round records a measurement attempt
        import sys
        import traceback

        traceback.print_exc()
        print(
            json.dumps(
                {
                    "metric": "mot17_800px_flagship_inference",
                    "value": 0.0,
                    "unit": "frames/sec/chip",
                    "vs_baseline": 0.0,
                }
            )
        )
        sys.exit(0)
