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
    sampler = RandomSampler(dataset_val, seed=0)
    n_track = int(cfg.max_track_queries) if cfg.tracking else 0
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
    )

    @jax.jit
    def eval_step(params, batch, targets, sizes):
        out = model.apply(params, batch, targets, deterministic=True)
        losses = criterion(out, targets)
        results = postprocessors["bbox"](out, sizes)
        return losses, results

    evaluator = CocoEvaluator(dataset_val.coco)
    logger = MetricLogger(print_freq=int(cfg.log_interval), debug=bool(cfg.debug))
    for batch in logger.log_every(loader, "Eval"):
        images: ImageBatch = batch["image"]
        targets = batch["target"]
        # original sizes for absolute-coordinate eval (reference evaluates
        # in orig_size space, engine.py:203-255)
        sizes = jnp.asarray(batch["orig_sizes"], jnp.float32)
        losses, results = eval_step(
            params,
            jax.tree_util.tree_map(jnp.asarray, images),
            jax.tree_util.tree_map(jnp.asarray, targets),
            sizes,
        )
        logger.update(
            **{k: float(v) for k, v in losses.items() if jnp.ndim(v) == 0}
        )
        # make_results ≙ reference engine.py:24-99
        preds = {}
        for i, img_id in enumerate(batch["image_ids"].tolist()):
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
