"""The HARD synthetic-MOT accuracy gate (VERDICT r2 next-step #1).

Unlike test_synthetic_mota (two well-separated objects, perfect
detections — a gross-breakage guard), this scene exercises the failure
modes real MOTA/IDF1 punish:

- two objects CROSS paths mid-sequence (heavy box overlap) — the track
  queries must hold identities through the crossing,
- one object is fully OCCLUDED behind a pillar for 6 frames — its track
  terminates, goes inactive, and must be RE-IDENTIFIED on reappearance
  via the greedy center-distance reid (reference tracker.py:230-267;
  the embed-distance LSAP reid needs appearance-discriminative
  embeddings a tiny overfit model cannot provide — measured: the
  same-object embed distance across the occlusion is NOT smaller than
  cross-object distances — so that path is covered by unit tests in
  test_tracker.py instead),
- the public-detection file carries jittered boxes, dropped detections
  and spurious false positives, and the tracker runs with
  public_detections=min_iou_0_5 filtering (reference tracker.py:150-168)
  and a LOW spawn threshold — the public-detections paradigm: the IoU
  filter provides precision, so recall can be bought cheaply.

Training recipe notes (hard-won, see PLAN.md round-3 log):
- every frame is a training target (f0 included) — the tracker's first
  frame needs from-scratch detections,
- frame-0 steps always run with EMPTY prev-targets (+1/8 of all steps):
  without this, objects that usually arrive as track queries learn only
  weak static-prior detections and are missed at sequence start,
- lr drop at ~80% of iterations stabilizes the landing point.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kinet_tpu.config import load_config
from kinet_tpu.data.synthetic import hard_scene

from kinet_tpu.data.synthetic import (  # noqa: E402
    IMAGENET_MEAN as MEAN,
    IMAGENET_STD as STD,
    SceneGTSeq as _FakeSeq,
    scene_frame_tensors,
)


def _frame_tensors(scene, f, hidden_dim, n_slots, n_track_queries):
    return scene_frame_tensors(
        scene, f, hidden_dim=hidden_dim, n_slots=n_slots,
        n_track_queries=n_track_queries,
    )


@pytest.fixture(scope="module")
def trained_hard_model():
    from kinet_tpu.engine.state import TrainState, build_optimizer
    from kinet_tpu.engine.train_step import make_train_step
    from kinet_tpu.models.build import build_model

    scene = hard_scene(n_frames=26, pillar_frac=0.58)
    cfg = load_config(
        "train.yaml",
        named=["train_deformable", "train_tracking", "train_multi_frame"],
    ).replace(
        dataset="mot", backbone="resnet_test", hidden_dim=36, nheads=2,
        enc_layers=2, dec_layers=2, dim_feedforward=64, num_queries=10,
        max_track_queries=8, dropout=0.0, aux_loss=False,
        num_feature_levels=4, dec_n_points=2, enc_n_points=2,
        with_box_refine=False,
        lr=1e-3, lr_backbone=1e-4, weight_decay=0.0, clip_max_norm=0.1,
        # the FN sim is the occlusion trainer: queries for vanished
        # objects must learn to score low
        track_query_false_negative_prob=0.4,
        track_query_false_positive_prob=0.1,
        lr_drop=1,
        # pin the encoder to all-levels high-level updates: this gate
        # exercises the TRACKER machinery (reid, identity across
        # occlusion, public-det filtering) with a deterministic tiny-model
        # recipe; the flagship enc_lite_high_klevels=2 default is
        # accuracy-gated at chip scale instead (scripts/bench_mota_hard.py
        # sessions, PLAN.md: k=2 scores BETTER than all-levels on the
        # 100-frame 672x1184 scene, while at hidden-36 toy scale the same
        # flag lands poorly — tiny trajectories do not transfer)
        enc_lite_high_klevels=0,
        # same reasoning for the decoder-side restriction: the flagship
        # dec_klevels=2 default is chip-scale gated (bmh_k2.json: MOTA
        # 0.9933, reid fires), while at hidden-36 toy scale it perturbs
        # the training trajectory enough to lose the occlusion reid
        dec_klevels=0,
    )
    model, criterion, _ = build_model(cfg)
    frames = [
        _frame_tensors(scene, f, hidden_dim=36, n_slots=3, n_track_queries=8)
        for f in range(scene.n_frames)
    ]

    def train():
        params = jax.jit(model.init)(jax.random.PRNGKey(0), *frames[1])
        tx = build_optimizer(cfg, params, steps_per_epoch=620)  # drop @620
        state = TrainState.create(params, tx)
        step = make_train_step(model, criterion, tx, cfg)
        rng = jax.random.PRNGKey(1)
        last = None
        for it in range(780):
            f = it % scene.n_frames
            batch, targets = frames[f]
            pbatch, ptargets = frames[max(f - 1, 0)]
            if f == 0 or it % 8 == 7:
                # sequence-start simulation (see module docstring)
                ptargets = ptargets.replace(valid=ptargets.valid & False)
            state, losses = step(
                state, jax.random.fold_in(rng, it), batch, targets, pbatch,
                ptargets,
            )
            last = float(losses["loss"])
        assert np.isfinite(last)
        return state.params

    # cached across suite runs on an UNCHANGED tree only (see
    # _train_cache.py: the key hashes every kinet_tpu/cfgs source plus
    # the scene and recipe — a code change always retrains)
    import hashlib

    from _train_cache import cached_train

    params = cached_train(
        {
            "test": "synthetic_mota_hard",
            "cfg": cfg.to_dict(),
            "iters": 780,
            "scene": hashlib.sha256(
                b"".join(
                    scene.render(f).tobytes() for f in range(scene.n_frames)
                )
            ).hexdigest(),
            "dets": [scene.dets[f] for f in range(scene.n_frames)],
        },
        train,
    )
    return scene, cfg, model, params


def _run_tracker(scene, cfg, model, params, tracker_over=None):
    from kinet_tpu.models.postprocess import build_postprocessors
    from kinet_tpu.tracking.tracker import Tracker

    post = build_postprocessors(cfg)["bbox"]
    tracker_cfg = dict(
        # LOW spawn threshold + IoU-0.5 public filtering (the public-dets
        # paradigm); track hysteresis at 0.3 sits between the trained
        # real-track band (~0.45-0.65) and background
        detection_obj_score_thresh=0.2,
        track_obj_score_thresh=0.3,
        detection_nms_thresh=0.4,
        track_nms_thresh=0.9,
        public_detections="min_iou_0_5",
        inactive_patience=10,
        reid_sim_threshold=0.0,
        reid_sim_only=False,
        reid_score_thresh=0.3,
        reid_greedy_matching=True,
        prev_frame_dist=1,
        steps_termination=1,
    )
    tracker_cfg.update(tracker_over or {})
    tracker = Tracker(
        model, params, post, tracker_cfg,
        num_object_queries=int(cfg.num_queries),
        num_track_slots=int(cfg.max_track_queries),
        hidden_dim=int(cfg.hidden_dim),
    )
    for f in range(scene.n_frames):
        img = scene.render(f).astype(np.float32) / 255.0
        img = (img - MEAN) / STD
        dets_xywh = np.array(
            [b for b, _ in scene.dets[f]], np.float32
        ).reshape(-1, 4)
        dets_xyxy = dets_xywh.copy()
        dets_xyxy[:, 2:] += dets_xyxy[:, :2]
        tracker.step(
            {
                "images": img[None],
                "pad_mask": np.zeros((1, scene.h, scene.w), bool),
                "orig_size": (scene.h, scene.w),
                "dets": dets_xyxy,
            }
        )
    return tracker


def test_hard_scene_mota_idf1_and_reid(trained_hard_model):
    from kinet_tpu.utils.mot_metrics import evaluate_mot_accums, get_mot_accum

    scene, cfg, model, params = trained_hard_model
    tracker = _run_tracker(scene, cfg, model, params)
    results = tracker.get_results()

    accum = get_mot_accum(results, _FakeSeq(scene))
    summary = evaluate_mot_accums([accum], ["hard"], generate_overall=False)
    m = summary["hard"]

    # the occluded object MUST come back through the reid machinery
    # (greedy center-distance reid of inactive tracks, or the inactive
    # track-row revival — both count num_reids)
    assert tracker.num_reids >= 1, m
    # identity held across the occlusion: the hypothesis id covering
    # object 3 before the occlusion also covers it after
    (hide_f, show_f) = scene.occlusion_spans()[3]
    gt3 = {
        f: scene.gt_at(f)[3]
        for f in list(range(hide_f)) + list(range(show_f, scene.n_frames))
    }

    def covering_id(f):
        x, y, w, h = gt3[f]
        gt_box = np.array([x, y, x + w, y + h])
        best, best_iou = None, 0.0
        for tid, track in results.items():
            if f not in track:
                continue
            b = np.asarray(track[f]["bbox"][:4])
            x0, y0 = np.maximum(gt_box[:2], b[:2])
            x1, y1 = np.minimum(gt_box[2:], b[2:])
            inter = max(0.0, x1 - x0) * max(0.0, y1 - y0)
            a1 = (gt_box[2] - gt_box[0]) * (gt_box[3] - gt_box[1])
            a2 = (b[2] - b[0]) * (b[3] - b[1])
            iou = inter / max(a1 + a2 - inter, 1e-9)
            if iou > best_iou:
                best, best_iou = tid, iou
        return best if best_iou >= 0.4 else None

    pre_ids = {covering_id(f) for f in range(hide_f)} - {None}
    post_ids = {
        covering_id(f) for f in range(show_f + 1, scene.n_frames)
    } - {None}
    assert pre_ids and post_ids, (pre_ids, post_ids)
    assert pre_ids & post_ids, (
        f"identity lost across occlusion: {pre_ids} vs {post_ids}"
    )

    # overall quality: crossings + occlusion + det noise tolerated.
    # Margins are wide on purpose (tiny-model landing points move with
    # platform/rounding); a broken identity/reid/NMS path scores far
    # below these (reference-quality run: mota ~0.85, idf1 ~0.75, sw 1-2)
    assert m["mota"] > 0.6, m
    assert m["idf1"] > 0.55, m
    assert m["num_switches"] <= 4, m
