"""Chip-scale hard synthetic-MOT accuracy session (VERDICT r2 next #1).

The suite-scale gate (tests/test_synthetic_mota_hard.py) runs a tiny
model on an 80x128 scene; this script runs the SAME failure modes —
path crossings, K-frame occlusion -> reid, noisy public detections with
min_iou_0_5 filtering — at flagship scale on the real chip:

- flagship config family (deformable + tracking + multi-frame, hidden
  288, all perf surgery active, bf16),
- 100-frame 672x1184 scene with 12 objects (11 crossing + 1 occluded),
- train to convergence on-chip, then run the full cached tracker and
  score CLEAR-MOT/IDF1 + reid count.

Record the resulting numbers in PLAN.md as the on-chip accuracy session
evidence. Not part of the suite (runtime ~15 min on one v5e).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_mota_hard.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax

# persistent compile cache: stages resume without recompiling
jax.config.update("jax_compilation_cache_dir", "/tmp/kinet_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from kinet_tpu.config import load_config
from kinet_tpu.data.synthetic import (
    IMAGENET_MEAN as MEAN,
    IMAGENET_STD as STD,
    SceneGTSeq,
    hard_scene,
    scene_frame_tensors,
)

N_FRAMES, H, W, N_OBJ = 100, 672, 1184, 12
N_SLOTS = 20  # padded target slots — matches the flagship train-step
# compile shapes (672x1184, 20 object slots) so the persistent cache
# from bench_train/B-scaling runs is a HIT (a fresh compile at novel
# shapes can exceed a whole stage through the tunnel)
ITERS = int(os.environ.get("BMH_ITERS", "2400"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def build_scene():
    return hard_scene(
        n_frames=N_FRAMES, h=H, w=W, n_objects=N_OBJ,
        obj_w=80, obj_h=100, speed=11.0, pillar_w=72, row_gap=38,
        pillar_frac=0.58, det_jitter=6.0,
    )


def frame_tensors(scene, f, cfg):
    # identical scene-to-tensor pipeline as the suite gate (shared helper)
    return scene_frame_tensors(
        scene, f, hidden_dim=int(cfg.hidden_dim), n_slots=N_SLOTS,
        n_track_queries=int(cfg.max_track_queries),
    )


def main():
    from kinet_tpu.engine.state import TrainState, build_optimizer
    from kinet_tpu.engine.train_step import make_train_step
    from kinet_tpu.models.build import build_model
    from kinet_tpu.models.postprocess import build_postprocessors
    from kinet_tpu.tracking.tracker import Tracker
    from kinet_tpu.utils.mot_metrics import evaluate_mot_accums, get_mot_accum

    scene = build_scene()
    log(f"scene: {N_FRAMES} frames {H}x{W}, {N_OBJ} objects, "
        f"occlusion spans {scene.occlusion_spans()}")

    # EXACTLY the bench_train/B-scaling config (defaults: dropout 0.1,
    # FN 0.4 / FP 0.1, lr 2e-4) — any changed constant (even an lr value)
    # re-keys the train-step compile and forfeits the persistent cache
    cfg = load_config(
        "train.yaml",
        named=["train_deformable", "train_tracking", "train_multi_frame"],
    ).replace(dataset="mot", compute_dtype="bfloat16", remat=True)
    # BMH_VARIANT='{"enc_msda_shared_locs": true}': accuracy-gate a
    # semantic model variant — applied at BUILD time so training AND
    # inference run the variant (unlike BMH_INT8, which is an
    # inference-only rebuild on the exact-trained checkpoint). Point
    # BMH_PARAMS at a variant-specific file: the exact-model checkpoint
    # is not transferable (param shapes/semantics differ).
    variant = json.loads(os.environ.get("BMH_VARIANT", "{}"))
    if variant:
        log(f"variant overrides: {variant}")
        variant.setdefault("allow_lossy", True)
        cfg = cfg.replace(**variant)
    model, criterion, _ = build_model(cfg)

    frames_np = {}

    def get_frame(f):
        if f not in frames_np:
            frames_np[f] = frame_tensors(scene, f, cfg)
        return frames_np[f]

    import pickle

    cache = os.environ.get("BMH_PARAMS", "/tmp/bmh_params.pkl")
    t_start = time.time()
    saved = None
    if os.path.exists(cache):
        try:
            with open(cache, "rb") as fh:
                saved = pickle.load(fh)
        except Exception as e:  # truncated write from a killed stage
            log(f"cache unreadable ({e}); starting fresh")
    if saved is not None:
        start_it, params = saved["it"] + 1, saved["params"]
        log(f"resuming from {cache} at it {start_it}")
    else:
        start_it = 0
        b0, t0 = get_frame(1)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), b0, t0)
    # steps_per_epoch=100 matches the cached compile (lr drop at
    # lr_drop(40) x 100 = 4000 — effectively no drop within this session)
    tx = build_optimizer(cfg, params, steps_per_epoch=100)
    state = TrainState.create(params, tx)
    # NOTE on resume: the optimizer state restarts fresh (adam moments
    # reset) — acceptable for this benchmark session; avoid resuming
    # right before the lr drop
    step = make_train_step(model, criterion, tx, cfg)
    rng = jax.random.PRNGKey(1)

    losses = None
    for it in range(start_it, ITERS):
        f = it % N_FRAMES
        batch, targets = get_frame(f)
        pbatch, ptargets = get_frame(max(f - 1, 0))
        if f == 0 or it % 8 == 7:
            # sequence-start simulation (see tests/test_synthetic_mota_hard)
            ptargets = ptargets.replace(valid=ptargets.valid & False)
        state, losses = step(
            state, jax.random.fold_in(rng, it), batch, targets, pbatch,
            ptargets,
        )
        if it % 200 == 0:
            log(f"it {it} loss {float(losses['loss']):.3f} "
                f"({time.time() - t_start:.0f}s)")
        if it % 600 == 599:  # param fetch through the tunnel is slow —
            # checkpoint sparsely, never at it=0
            import numpy as _np

            with open(cache + ".tmp", "wb") as fh:
                pickle.dump(
                    {
                        "it": it,
                        "params": jax.tree_util.tree_map(
                            _np.asarray, state.params
                        ),
                    },
                    fh,
                )
            os.replace(cache + ".tmp", cache)  # atomic vs killed stages
    if losses is not None:
        log(f"train done: loss {float(losses['loss']):.3f} "
            f"in {time.time() - t_start:.0f}s")

    # BMH_INT8=1: rebuild the model for INFERENCE with int8 decoder quad
    # tables (dec_msda_int8 — inference-only quantization, params are
    # unchanged) to measure its accuracy cost on the same checkpoint.
    infer_model = model
    if os.environ.get("BMH_INT8"):
        log("tracker: dec_msda_int8=true (lossy A/B)")
        infer_model, _, _ = build_model(
            cfg.replace(dec_msda_int8=True, allow_lossy=True)
        )

    post = build_postprocessors(cfg)["bbox"]
    tracker_cfg = dict(
        detection_obj_score_thresh=0.2, track_obj_score_thresh=0.3,
        detection_nms_thresh=0.4, track_nms_thresh=0.9,
        public_detections="min_iou_0_5", inactive_patience=14,
        reid_sim_threshold=0.0, reid_sim_only=False, reid_score_thresh=0.3,
        reid_greedy_matching=True, prev_frame_dist=1, steps_termination=1,
    )
    tracker = Tracker(
        infer_model, state.params, post, tracker_cfg,
        num_object_queries=int(cfg.num_queries),
        num_track_slots=int(cfg.max_track_queries),
        hidden_dim=int(cfg.hidden_dim),
    )
    t_track = time.time()
    for f in range(N_FRAMES):
        img = scene.render(f).astype(np.float32) / 255.0
        img = (img - MEAN) / STD
        d = np.array([b for b, _ in scene.dets[f]], np.float32).reshape(-1, 4)
        dxy = d.copy()
        dxy[:, 2:] += dxy[:, :2]
        tracker.step(
            {
                "images": img[None],
                "pad_mask": np.zeros((1, H, W), bool),
                "orig_size": (H, W),
                "dets": dxy,
            }
        )
    track_s = time.time() - t_track
    log(f"tracked {N_FRAMES} frames in {track_s:.1f}s "
        f"({N_FRAMES / track_s:.1f} Hz incl. compile)")

    accum = get_mot_accum(tracker.get_results(), SceneGTSeq(scene))
    summary = evaluate_mot_accums([accum], ["hard"], generate_overall=False)
    m = summary["hard"]

    print(json.dumps(
        {
            "mota": m["mota"], "idf1": m["idf1"], "hota": m["hota"],
            "num_switches": m["num_switches"], "reids": tracker.num_reids,
            "train_s": round(time.time() - t_start - track_s),
            "track_hz": round(N_FRAMES / track_s, 2),
        }
    ), flush=True)


if __name__ == "__main__":
    main()
