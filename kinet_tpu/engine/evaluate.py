"""During-training evaluation (reference: src/trackformer/engine.py:179-364).

- detection eval: jitted forward + postprocess over the val set into the
  self-contained CocoEvaluator (reference engine.py:190-278),
- tracking eval: runs the tracking pipeline in-process with the live model
  (the reference intends this via `ex.run(config_updates=...)` but its `ex`
  import is commented out — NameError, SURVEY §8.2; here main_track is
  called directly with obj_detector_model injected, the evident intent of
  engine.py:315-331), sequences split round-robin across hosts
  (engine.py:291-304).

Returns a stats dict {loss, coco_eval_bbox (12 stats), mota?, idf1?}.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import DataLoader, RandomSampler
from ..structs import ImageBatch
from ..utils.coco_eval import CocoEvaluator
from ..utils.logging import MetricLogger


def evaluate(model, criterion, postprocessors, params, dataset_val, cfg):
    # shard the val set across hosts; CocoEvaluator merges the prediction
    # shards in synchronize_between_processes (reference engine.py:259-264)
    sampler = RandomSampler(
        dataset_val, rank=jax.process_index(),
        world_size=jax.process_count(), seed=0,
    )
    kine = bool(cfg.get("kine", False))
    n_track = int(cfg.max_track_queries) if cfg.tracking else 0
    collate = None
    if kine:
        # kine batches: (detections, metadata, target) triples, padded to
        # static shapes — same collate the train loop uses (the reference
        # crashes here: engine.py unconditionally unpacks image batches,
        # SURVEY §8.10; implemented as evidently intended)
        import functools

        from ..data.kinematic import collate_kine

        trail_len = max(int(cfg.track_prev_frame_range), 1)
        meta_dim = 2 if cfg.use_class else 1
        collate = functools.partial(
            collate_kine,
            max_detections=int(cfg.max_number_detection),
            max_objects=int(cfg.max_objects),
            trail_len=trail_len,
            meta_dim=meta_dim,
            empty_start=bool(cfg.use_empty_start),
        )
    loader = DataLoader(
        dataset_val,
        batch_size=int(cfg.batch_size),
        sampler=sampler,
        buckets=cfg.size_buckets,
        max_objects=int(cfg.max_objects),
        num_track_queries=n_track,
        hidden_dim=int(cfg.hidden_dim),
        num_workers=int(cfg.num_workers),
        drop_last=False,
        collate_fn=collate,
    )

    @jax.jit
    def eval_step(params, batch, targets, sizes):
        out = model.apply(params, batch, targets, deterministic=True)
        losses = criterion(out, targets)
        results = postprocessors["bbox"](out, sizes)
        return losses, results

    if kine:
        from ..structs import KineBatch, Targets
        from ..tracking.kine_augment import kine_track_embed_dims

        enc0 = (
            int(cfg.encoding_dim_tracklets)
            if cfg.get("use_encoding_tracklets", False)
            else 0
        )
        trail_len = max(int(cfg.track_prev_frame_range), 1)
        meta_dim = 2 if cfg.use_class else 1
        tdim, mdim = kine_track_embed_dims(trail_len, enc0, meta_dim)

        @jax.jit
        def eval_step_kine(params, batch_dict, sizes):
            kb = KineBatch(
                detections=batch_dict["detections"],
                metadata=batch_dict["metadata"],
                pad_mask=batch_dict["det_pad_mask"],
            )
            # eval-mode track queries: empty slots (reference
            # detr_tracking.py:268-279 zero-fills at eval)
            targets = Targets.create(
                batch_dict["boxes"], batch_dict["labels"],
                batch_dict["valid"], batch_dict["track_ids"],
                num_track_queries=n_track, hidden_dim=tdim + mdim,
            )
            out = model.apply(params, kb, targets, deterministic=True)
            losses = criterion(out, targets)
            results = postprocessors["bbox"](out, sizes)
            return losses, results

    evaluator = CocoEvaluator(dataset_val.coco)
    logger = MetricLogger(print_freq=int(cfg.log_interval), debug=bool(cfg.debug))
    for batch in logger.log_every(loader, "Eval"):
        # original sizes for absolute-coordinate eval (reference evaluates
        # in orig_size space, engine.py:203-255)
        sizes = jnp.asarray(batch["orig_sizes"], jnp.float32)
        if kine:
            losses, results = eval_step_kine(
                params,
                jax.tree_util.tree_map(jnp.asarray, dict(batch)),
                sizes,
            )
            image_ids = np.asarray(batch["image_ids"])
        else:
            images: ImageBatch = batch["image"]
            targets = batch["target"]
            losses, results = eval_step(
                params,
                jax.tree_util.tree_map(jnp.asarray, images),
                jax.tree_util.tree_map(jnp.asarray, targets),
                sizes,
            )
            image_ids = batch["image_ids"]
        logger.update(
            **{k: float(v) for k, v in losses.items() if jnp.ndim(v) == 0}
        )
        # make_results ≙ reference engine.py:24-99
        preds = {}
        for i, img_id in enumerate(np.asarray(image_ids).tolist()):
            preds[int(img_id)] = {
                "boxes": np.asarray(results["boxes"][i]),
                "scores": np.asarray(results["scores"][i]),
                "labels": np.asarray(results["labels"][i]),
            }
        evaluator.update(preds)
    evaluator.synchronize_between_processes()
    evaluator.accumulate()
    stats = {"coco_eval_bbox": evaluator.summarize()}

    if cfg.get("tracking_eval", False) and cfg.tracking:
        from ..config import load_config
        from .track import main_track

        overrides = {}
        if cfg.get("tracking_eval_dataset"):
            # e.g. 'MOT17-TRAIN-ALL' or a single sequence; the track.yaml
            # default (MOT17-ALL-ALL) requires every standard sequence dir
            # to exist under mot_path_val
            overrides["dataset_name"] = cfg.tracking_eval_dataset
        track_cfg = load_config("track.yaml").replace(
            data_root_dir=cfg.mot_path_val, output_dir="", **overrides
        )
        summary = main_track(
            track_cfg,
            obj_detector_model=(model, params, postprocessors, cfg),
        )
        if summary:
            overall = summary.get("OVERALL") or next(iter(summary.values()))
            stats["mota"] = overall["mota"]
            stats["idf1"] = overall["idf1"]
    return stats
