"""KineT accuracy gate, end-to-end on synthetic detections: train the
encoder-only kinematic associator (the fork's headline contribution,
reference detr.py:427-564 + detr_tracking.py:524-872) on a synthetic
constant-velocity scene through the REAL mot_kine data path (COCO jsons +
det json -> collate_kine trails -> make_kine_train_step), then run
TrackerKinematic over the same scene via main_track and score
CLEAR-MOT/IDF1 — the kine counterpart of test_synthetic_mota.py's
image-model gate (no real MOT17 mountable)."""
import configparser
import json
import os.path as osp

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from kinet_tpu.config import load_config, save_config

N_FRAMES, H, W = 40, 64, 192
SEQ = "MOT17-09-FRCNN"


def _boxes_at(f):
    """Two well-separated constant-velocity objects; xywh pixel coords."""
    return [
        (4 + 3 * f, 8, 22, 28),     # moves right along the top
        (166 - 3 * f, 30, 20, 26),  # moves left along the bottom
    ]


def _dets_at(f):
    """Public detections: GT with deterministic +-1px jitter (the north
    star scores association over NOISY external detections)."""
    rng = np.random.default_rng(1000 + f)
    out = []
    for (x, y, w, h) in _boxes_at(f):
        dx, dy, dw, dh = (int(v) for v in rng.integers(-1, 2, 4))
        out.append((x + dx, y + dy, max(w + dw, 4), max(h + dh, 4)))
    return out


@pytest.fixture(scope="module")
def kine_scene(tmp_path_factory):
    """The scene in BOTH representations: a MOT17 sequence dir (tracking
    phase) and extended-COCO + det jsons (mot_kine training phase)."""
    root = tmp_path_factory.mktemp("kine_mota")
    # --- MOT17 dir ---
    seq_dir = root / "MOT17" / "train" / SEQ
    for d in ("img1", "gt", "det"):
        (seq_dir / d).mkdir(parents=True)
    (root / "MOT17" / "test").mkdir(parents=True)
    cfgp = configparser.ConfigParser()
    cfgp["Sequence"] = {
        "name": SEQ, "imDir": "img1", "frameRate": "30",
        "seqLength": str(N_FRAMES), "imWidth": str(W), "imHeight": str(H),
        "imExt": ".jpg",
    }
    with open(seq_dir / "seqinfo.ini", "w") as fh:
        cfgp.write(fh)
    black = Image.fromarray(np.zeros((H, W, 3), np.uint8))
    gt_lines, det_lines = [], []
    for f in range(N_FRAMES):
        black.save(seq_dir / "img1" / f"{f + 1:06d}.jpg")
        for tid, (x, y, w, h) in enumerate(_boxes_at(f), start=1):
            gt_lines.append(f"{f + 1},{tid},{x},{y},{w},{h},1,1,1.0")
        for (x, y, w, h) in _dets_at(f):
            det_lines.append(f"{f + 1},-1,{x},{y},{w},{h},0.95,-1,-1")
    (seq_dir / "gt" / "gt.txt").write_text("\n".join(gt_lines) + "\n")
    (seq_dir / "det" / "det.txt").write_text("\n".join(det_lines) + "\n")

    # --- extended-COCO + det jsons (mot_kine training input) ---
    ann_dir = root / "coco" / "annotations"
    ann_dir.mkdir(parents=True)
    images, annotations = [], []
    aid = 0
    for f in range(N_FRAMES):
        images.append(
            {
                "id": f, "file_name": f"{SEQ}_{f + 1:06d}.jpg",
                "height": H, "width": W, "frame_id": f,
                "first_frame_image_id": 0, "seq_length": N_FRAMES,
                "seq": SEQ,
            }
        )
        for tid, (x, y, w, h) in enumerate(_boxes_at(f), start=1):
            annotations.append(
                {
                    "id": aid, "image_id": f, "category_id": 1,
                    "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0,
                    "track_id": tid,
                }
            )
            aid += 1
    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "person"}],
        "sequences": [SEQ],
    }
    with open(ann_dir / "train.json", "w") as fh:
        json.dump(coco, fh)
    det_annotations = []
    for f in range(N_FRAMES):
        for (x, y, w, h) in _dets_at(f):
            det_annotations.append(
                {
                    "id": len(det_annotations), "image_id": f,
                    "category_id": 1, "bbox": [x, y, w, h],
                    "area": w * h, "iscrowd": 0, "confidence": 0.95,
                }
            )
    dets = {**coco, "annotations": det_annotations}
    with open(ann_dir / "det_train.json", "w") as fh:
        json.dump(dets, fh)
    return str(root)


def _run_kine_gate(kine_scene, tmp_path, cfg, cache_tag, iters=1200,
                   tracker_over=None):
    """Train a kine model on the synthetic scene through the REAL mot_kine
    path, track it via main_track, return the CLEAR-MOT summary row."""
    import functools

    from kinet_tpu.data import build_dataset
    from kinet_tpu.data.kinematic import collate_kine
    from kinet_tpu.data.loader import DataLoader, RandomSampler
    from kinet_tpu.engine.state import TrainState, build_optimizer
    from kinet_tpu.engine.track import main_track
    from kinet_tpu.engine.train_step import make_kine_train_step
    from kinet_tpu.models.build import build_model
    from kinet_tpu.structs import KineBatch, Targets
    from kinet_tpu.tracking.kine_augment import kine_track_embed_dims
    from kinet_tpu.utils.checkpoint import CheckpointManager

    # the dataset draws its per-item augmentation base seed from the
    # GLOBAL np.random state AT CONSTRUCTION (engine.train seeds it first;
    # a direct pipeline must too, or every process trains on different
    # augmentation draws)
    np.random.seed(0)
    model, criterion, _ = build_model(cfg)
    ds = build_dataset("train", cfg)
    trail_len = max(int(cfg.track_prev_frame_range), 1)
    meta_dim = 2 if cfg.use_class else 1
    enc = (
        int(cfg.encoding_dim_tracklets)
        if cfg.get("use_encoding_tracklets", False)
        else 0
    )
    collate = functools.partial(
        collate_kine,
        max_detections=int(cfg.max_number_detection),
        max_objects=int(cfg.max_objects),
        trail_len=trail_len,
        meta_dim=meta_dim,
        empty_start=bool(cfg.use_empty_start),
    )

    def make_loader():
        return DataLoader(
            ds, batch_size=int(cfg.batch_size),
            sampler=RandomSampler(ds, seed=0), buckets=cfg.size_buckets,
            max_objects=int(cfg.max_objects),
            num_track_queries=int(cfg.max_track_queries),
            hidden_dim=int(cfg.hidden_dim), num_workers=1,
            collate_fn=collate,
        )

    def train():
        first = next(iter(make_loader()))
        kb0 = KineBatch(
            detections=jnp.asarray(first["detections"]),
            metadata=jnp.asarray(first["metadata"]),
            pad_mask=jnp.asarray(first["det_pad_mask"]),
        )
        tdim, mdim = kine_track_embed_dims(trail_len, enc, meta_dim)
        tg0 = Targets.create(
            jnp.asarray(first["boxes"]), jnp.asarray(first["labels"]),
            jnp.asarray(first["valid"]), jnp.asarray(first["track_ids"]),
            num_track_queries=int(cfg.max_track_queries),
            hidden_dim=tdim + mdim,
        )
        params = jax.jit(model.init)(jax.random.PRNGKey(0), kb0, tg0)
        tx = build_optimizer(cfg, params, steps_per_epoch=10_000)
        state = TrainState.create(params, tx)
        step = make_kine_train_step(model, criterion, tx, cfg)
        rng = jax.random.PRNGKey(1)
        it = 0
        last = None
        while it < iters:
            for batch_dict in make_loader():
                if it >= iters:
                    break
                batch_dict = jax.tree_util.tree_map(
                    jnp.asarray, dict(batch_dict)
                )
                state, losses = step(
                    state, jax.random.fold_in(rng, it), batch_dict
                )
                last = float(losses["loss"])
                it += 1
        assert np.isfinite(last)
        return state.params

    from _train_cache import cached_train

    # the tmp fixture path changes per run: strip it from the key so the
    # cached params are reused across suite runs (retrain on code change)
    key_cfg = {
        k: ("<data>" if k.startswith("mot_path") else v)
        for k, v in cfg.to_dict().items()
    }
    trained = cached_train(
        {
            "test": cache_tag,
            "cfg": key_cfg,
            "iters": iters,
            "boxes": [_boxes_at(f) for f in range(N_FRAMES)],
            "dets": [_dets_at(f) for f in range(N_FRAMES)],
        },
        train,
    )

    ckpt_dir = tmp_path / "kine_model"
    save_config(cfg, ckpt_dir)
    mgr = CheckpointManager(str(ckpt_dir))
    mgr._save(mgr.dir / "checkpoint", {"params": trained, "epoch": 0})

    over = {
        "tracker_cfg.detection_obj_score_thresh": 0.3,
        "tracker_cfg.track_obj_score_thresh": 0.3,
        # suppress duplicate spawns of already-tracked objects: the
        # model learns to down-score a tracked object's detection row
        # (eos supervision), but residual scores can sit near the
        # threshold at this training scale
        "tracker_cfg.detection_nms_thresh": 0.5,
        # report the associated PUBLIC detection's box (the learned
        # box head interpolates toward the trail at this tiny training
        # scale; association is what the gate measures)
        "tracker_cfg.snap_to_detections": True,
    }
    if tracker_over:
        over.update(tracker_over)
    track_cfg = load_config("track_kinet.yaml").replace(
        obj_detect_checkpoint_dir=str(ckpt_dir),
        data_root_dir=kine_scene,
        dataset_name=SEQ,
        output_dir=str(tmp_path / "results"),
        **over,
    )
    summary = main_track(track_cfg)
    assert summary is not None and SEQ in summary
    return summary[SEQ]


def _encoder_cfg(root):
    l, enc = 3, 4
    return load_config("train.yaml", named=["train_kinet2"]).replace(
        dataset="mot_kine",
        mot_path_train=osp.join(root, "coco"),
        mot_path_val=osp.join(root, "coco"),
        hidden_dim=64, nheads=2, dim_feedforward=128,
        max_objects=6, max_number_detection=8, max_track_queries=8,
        track_prev_frame_range=l, encoding_dim_tracklets=enc,
        use_encoding_tracklets=True, tracking=True,
        dropout=0.0, batch_size=4, num_workers=1,
        lr=5e-4, weight_decay=0.0, clip_max_norm=0.1,
        # randomized tracklet count (incl. zero): with a FIXED count every
        # GT is pinned to a trail slot, detection rows never receive
        # positive supervision, and the zero-trail first tracker frame is
        # out of distribution — the model then cannot spawn its first
        # track (scores collapse). The random count leaves random subsets
        # to the ordered matcher's detection-slot fallback (reference
        # matcher.py:666-676) and covers the no-trails input.
        ratio_add_tracklets=1.0, kine_random_tracklet_count=True,
        ratio_add_detections=0.5,
    )


def test_kine_overfit_then_track_scores_mota(kine_scene, tmp_path):
    m = _run_kine_gate(
        kine_scene, tmp_path, _encoder_cfg(kine_scene),
        cache_tag="synthetic_mota_kine_i2400", iters=2400,
    )
    print("KINE GATE:", {k: round(float(v), 3) for k, v in m.items()})
    # measured landing at 2400 iters: MOTA 1.0 / IDF1 1.0 / HOTA 0.883 /
    # 0 switches (+-1px jittered public detections; the r3 1200-iter band
    # of MOTA 0.55 was undertraining, not a path limit). The defects this
    # gate caught scored MOTA <= 0.17 / IDF1 <= 0.59 (missing
    # detection-slot supervision, padded-row spawns, tail echo) — the
    # raised thresholds keep wide margins on both sides.
    assert m["mota"] > 0.75, m
    assert m["idf1"] > 0.85, m
    assert m["num_switches"] <= 2, m


def test_kine_dual_stream_overfit_then_track_scores_mota(
    kine_scene, tmp_path
):
    """The reference's MAIN KineT config (cfgs/train_kinet.yaml ->
    dual-stream KinematicDetectorTransformer, reference detr.py:288-425,
    raw 4-number trails + Hungarian matching): same synthetic
    constant-velocity gate as the encoder-only variant."""
    root = kine_scene
    l = 3
    # num_queries=50 (raised from the r4 gate's 12; reference production is
    # 150): Hungarian-matched scratch queries need a positive-supervision
    # budget ~linear in Q (tests/test_kine_query_scale.py measures the
    # mechanism: each query is matched a ~K/Q fraction of steps). Probes
    # (PLAN.md round 5): q50@1200 iters landed MOTA 0.887/IDF1 0.946; the
    # r4 "150 never converge" was the same starvation, not a path defect.
    # The torch-parity LayerNorm epsilon fix (1e-6 -> 1e-5, PARITY.md
    # round 5) shifted this knife-edge trajectory — at the corrected eps
    # q50@1200 drops one object entirely (MOTA 0.213) while q50@3600 and
    # q50@4800 are PERFECT (1.0/1.0/0 switches). Gate budget is therefore
    # 3600 iters: well past the starvation edge, wide margins both sides.
    cfg = load_config("train.yaml", named=["train_kinet"]).replace(
        dataset="mot_kine",
        mot_path_train=osp.join(root, "coco"),
        mot_path_val=osp.join(root, "coco"),
        hidden_dim=64, nheads=2, dim_feedforward=128, num_queries=50,
        max_objects=6, max_number_detection=8, max_track_queries=8,
        track_prev_frame_range=l, tracking=True,
        dropout=0.0, batch_size=4, num_workers=1,
        lr=5e-4, weight_decay=0.0, clip_max_norm=0.1,
        ratio_add_tracklets=1.0, kine_random_tracklet_count=True,
        ratio_add_detections=0.5,
    )
    m = _run_kine_gate(
        kine_scene, tmp_path, cfg,
        cache_tag="synthetic_mota_dual_q50_i3600", iters=3600,
    )
    print("KINE DUAL GATE:", {k: round(float(v), 3) for k, v in m.items()})
    # measured landing at q50@3600 (eps=1e-5): MOTA 1.0 / IDF1 1.0 /
    # HOTA 0.883 / 0 switches. Building this gate caught a
    # live tracker defect: spawn rows were sliced as per-detection rows
    # (encoder layout) so most of the dual model's object-query rows were
    # never spawn candidates — one object could never spawn (MOTA 0.5,
    # recall 0.5 hard ceiling; kine_tracker.rows_per_detection).
    assert m["mota"] > 0.6, m
    assert m["idf1"] > 0.8, m
    assert m["num_switches"] <= 2, m
