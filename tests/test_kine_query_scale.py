"""Query-scale diagnosis for the dual-stream KineT gate (VERDICT r4 #6).

The reference's main KineT config trains 150 Hungarian-matched decoder
queries (cfgs/train_kinet.yaml:9) for 500 epochs x batch 8; the r4 gate
runs 12 queries because 150 never localized at the 1200-iter gate budget.
This module diagnoses the mechanism and (env-gated) probes bigger query
counts with longer schedules:

  KINE_QSCALE=<num_queries> KINE_QSCALE_ITERS=<iters> \
      python -m pytest tests/test_kine_query_scale.py -q -s

Findings land in PLAN.md (round 5). The diagnostic test below always
runs: it measures PER-QUERY POSITIVE-SUPERVISION RATE — with Q queries
and <=2 objects/frame, each query is Hungarian-matched a ~2/Q fraction
of steps, so the positive-gradient budget per query falls linearly in Q
while the negative (eos/background) budget stays constant; the scratch
model's localization emerges only after a query has accumulated enough
positive matches."""
import os
import os.path as osp

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kinet_tpu.config import load_config

from test_synthetic_mota_kine import (  # noqa: E402
    _run_kine_gate,
    kine_scene,  # noqa: F401  (fixture re-export)
)


def _dual_cfg(root, num_queries, lr=5e-4):
    l = 3
    return load_config("train.yaml", named=["train_kinet"]).replace(
        dataset="mot_kine",
        mot_path_train=osp.join(root, "coco"),
        mot_path_val=osp.join(root, "coco"),
        hidden_dim=64, nheads=2, dim_feedforward=128,
        num_queries=num_queries,
        max_objects=6, max_number_detection=8, max_track_queries=8,
        track_prev_frame_range=l, tracking=True,
        dropout=0.0, batch_size=4, num_workers=1,
        lr=lr, weight_decay=0.0, clip_max_norm=0.1,
        ratio_add_tracklets=1.0, kine_random_tracklet_count=True,
        ratio_add_detections=0.5,
    )


@pytest.mark.skipif(
    not os.environ.get("KINE_QSCALE"),
    reason="opt-in experiment: set KINE_QSCALE=<num_queries> "
    "(and KINE_QSCALE_ITERS) to probe query-count scaling",
)
def test_kine_dual_stream_query_scale_probe(kine_scene, tmp_path):
    q = int(os.environ["KINE_QSCALE"])
    iters = int(os.environ.get("KINE_QSCALE_ITERS", "1200"))
    cfg = _dual_cfg(kine_scene, q)
    m = _run_kine_gate(
        kine_scene, tmp_path, cfg,
        cache_tag=f"synthetic_mota_dual_q{q}_i{iters}", iters=iters,
    )
    print(
        f"KINE QSCALE q={q} iters={iters}:",
        {k: round(float(v), 3) for k, v in m.items()},
    )


def test_kine_query_positive_supervision_starves_linearly(kine_scene):
    """The MECHANISM: per-query positive-match rate falls as ~K/Q (K =
    mean matchable objects per example), so at the gate budget a
    150-query model's median query has received only a handful of
    positive gradients while eos pressure is constant. Measured here by
    running the REAL matcher over the real mot_kine batches at q=12 vs
    q=150 on the same (fresh-init) model."""
    import functools

    from kinet_tpu.data import build_dataset
    from kinet_tpu.data.kinematic import collate_kine
    from kinet_tpu.data.loader import DataLoader, RandomSampler
    from kinet_tpu.models.build import build_model
    from kinet_tpu.structs import KineBatch, Targets
    from kinet_tpu.tracking.kine_augment import kine_track_embed_dims

    rates = {}
    for q in (12, 150):
        cfg = _dual_cfg(kine_scene, q)
        np.random.seed(0)
        model, criterion, _ = build_model(cfg)
        ds = build_dataset("train", cfg)
        trail_len = max(int(cfg.track_prev_frame_range), 1)
        meta_dim = 2 if cfg.use_class else 1
        collate = functools.partial(
            collate_kine,
            max_detections=int(cfg.max_number_detection),
            max_objects=int(cfg.max_objects),
            trail_len=trail_len, meta_dim=meta_dim,
            empty_start=bool(cfg.use_empty_start),
        )
        loader = DataLoader(
            ds, batch_size=int(cfg.batch_size),
            sampler=RandomSampler(ds, seed=0), buckets=cfg.size_buckets,
            max_objects=int(cfg.max_objects),
            num_track_queries=int(cfg.max_track_queries),
            hidden_dim=int(cfg.hidden_dim), num_workers=1,
            collate_fn=collate,
        )
        first = next(iter(loader))
        kb = KineBatch(
            detections=jnp.asarray(first["detections"]),
            metadata=jnp.asarray(first["metadata"]),
            pad_mask=jnp.asarray(first["det_pad_mask"]),
        )
        tdim, mdim = kine_track_embed_dims(trail_len, 0, meta_dim)
        tg = Targets.create(
            jnp.asarray(first["boxes"]), jnp.asarray(first["labels"]),
            jnp.asarray(first["valid"]), jnp.asarray(first["track_ids"]),
            num_track_queries=int(cfg.max_track_queries),
            hidden_dim=tdim + mdim,
        )
        params = jax.jit(model.init)(jax.random.PRNGKey(0), kb, tg)
        out = jax.jit(model.apply)(params, kb, tg)
        # run the criterion's matcher: query4target [B, N] (query index
        # per target slot, -1 invalid)
        from kinet_tpu.models.matcher import hungarian_match

        idx = hungarian_match(
            out["pred_logits"], out["pred_boxes"], tg,
            focal_loss=bool(cfg.focal_loss),
        )
        valid = np.asarray(tg.valid)
        matched_q = np.asarray(idx)[(np.asarray(idx) >= 0) & valid]
        n_pos = matched_q.size
        n_valid = int(valid.sum())
        b = valid.shape[0]
        rates[q] = n_pos / (b * q)  # fraction of queries matched this step
        assert n_pos <= n_valid
    # the positive-supervision rate collapses ~linearly in Q
    ratio = rates[12] / max(rates[150], 1e-9)
    assert ratio > 6, rates  # 150/12 = 12.5x fewer positives per query
