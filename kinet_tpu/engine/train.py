"""Training entry point (reference: src/train.py + src/trackformer/engine.py).

Usage (≙ `python src/train.py with deformable tracking ... key=value`):

    python -m kinet_tpu.engine.train --config train.yaml \
        --named train_deformable train_tracking train_mot17 \
        lr=1e-4 output_dir=runs/exp1

Structure (reference call stack, SURVEY §3.1):
- config composition + dump to output_dir/config.yaml (train.py:24-64),
- build model/criterion/postprocessors (train.py:82),
- optimizer with param groups + MultiStep lr (train.py:103-124),
- dataset + weighted sampler + loader (train.py:126-164),
- resume with shape-adapting surgery (train.py:167-282),
- epoch loop: jitted train step (the whole tracking two-forward step is
  one compiled function), eval every val_interval, checkpoint + best
  bookkeeping (train.py:295-357).
"""
from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..config import load_config, parse_cli_overrides, save_config
from ..data import build_dataset
from ..data.loader import DataLoader, RandomSampler, WeightedRandomSampler
from ..models.build import build_model
from ..parallel.mesh import make_mesh, data_sharding, replicated
from ..structs import ImageBatch, Targets
from ..utils.checkpoint import CheckpointManager, load_for_resume
from ..utils.logging import MetricLogger
from .state import TrainState, build_optimizer
from .train_step import make_train_step


def train(cfg):
    if cfg.output_dir:
        save_config(cfg, cfg.output_dir)
    np.random.seed(int(cfg.seed) + jax.process_index())

    model, criterion, postprocessors = build_model(cfg)

    dataset_train = build_dataset("train", cfg)
    sampler = (
        WeightedRandomSampler(
            dataset_train,
            rank=jax.process_index(),
            world_size=jax.process_count(),
            seed=int(cfg.seed),
        )
        if hasattr(dataset_train, "sample_weight")
        else RandomSampler(
            dataset_train,
            rank=jax.process_index(),
            world_size=jax.process_count(),
            seed=int(cfg.seed),
        )
    )
    kine = bool(cfg.get("kine", False))
    n_track = int(cfg.max_track_queries) if cfg.tracking else 0
    if kine:
        import functools

        from ..data.kinematic import collate_kine
        from ..structs import KineBatch

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
    else:
        collate = None
    loader = DataLoader(
        dataset_train,
        batch_size=int(cfg.batch_size),
        sampler=sampler,
        buckets=cfg.size_buckets,
        max_objects=int(cfg.max_objects),
        num_track_queries=n_track,
        hidden_dim=int(cfg.hidden_dim),
        num_workers=int(cfg.num_workers),
        collate_fn=collate,
    )
    steps_per_epoch = max(len(loader), 1)

    # init params from one real batch's shapes
    first = next(iter(loader))
    if kine:
        from ..structs import KineBatch, Targets
        from ..tracking.kine_augment import kine_track_embed_dims

        kb0 = KineBatch(
            detections=jnp.asarray(first["detections"]),
            metadata=jnp.asarray(first["metadata"]),
            pad_mask=jnp.asarray(first["det_pad_mask"]),
        )
        enc0 = (
            int(cfg.encoding_dim_tracklets)
            if cfg.get("use_encoding_tracklets", False)
            else 0
        )
        tdim, mdim = kine_track_embed_dims(trail_len, enc0, meta_dim)
        targets0 = Targets.create(
            jnp.asarray(first["boxes"]), jnp.asarray(first["labels"]),
            jnp.asarray(first["valid"]), jnp.asarray(first["track_ids"]),
            num_track_queries=n_track, hidden_dim=tdim + mdim,
        )
        params = jax.jit(model.init)(
            jax.random.PRNGKey(int(cfg.seed)), kb0, targets0
        )
    else:
        batch0 = ImageBatch(
            images=jnp.asarray(first["image"].images),
            pad_mask=jnp.asarray(first["image"].pad_mask),
        )
        targets0 = jax.tree_util.tree_map(jnp.asarray, first["target"])
        params = jax.jit(model.init)(
            jax.random.PRNGKey(int(cfg.seed)), batch0, targets0
        )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params / 1e6:.2f}M", flush=True)

    n_model = int(cfg.mesh.model)
    n_data = int(cfg.mesh.data)
    if n_data == -1:
        n_data = len(jax.devices()) // n_model
    # the global batch must shard evenly over the data axis
    import math as _math

    n_data = _math.gcd(n_data, int(cfg.batch_size)) or 1
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    repl = replicated(mesh)
    dsh = data_sharding(mesh)

    tx = build_optimizer(cfg, params, steps_per_epoch)
    params, opt_state, start_epoch = load_for_resume(cfg, params, tx)
    if n_model > 1:
        # tensor parallelism over the 'model' axis: Megatron-style weight
        # shardings; sharded BEFORE TrainState.create so the optimizer
        # moments (zeros_like) inherit the layout, and XLA/GSPMD inserts
        # the activation collectives inside the jitted step
        from ..parallel.tp import shard_params_tp

        params = shard_params_tp(params, mesh)
    else:
        params = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), params
        )
    state = TrainState.create(params, tx)
    if opt_state is not None:
        state = state.replace(opt_state=opt_state)
    state = state.replace(
        step=jax.device_put(state.step, repl)
    )

    if kine:
        from .train_step import make_kine_train_step

        step_fn = make_kine_train_step(model, criterion, tx, cfg)
    else:
        step_fn = make_train_step(model, criterion, tx, cfg)

    from ..utils.vis import build_visualizers

    visualizers = build_visualizers(cfg)
    ckpt = (
        CheckpointManager(cfg.output_dir, int(cfg.save_model_interval))
        if cfg.output_dir
        else None
    )
    rng = jax.random.PRNGKey(int(cfg.seed))

    for epoch in range(start_epoch, int(cfg.epochs) + 1):
        sampler.set_epoch(epoch)
        if hasattr(dataset_train, "set_epoch"):
            dataset_train.set_epoch(epoch)  # fresh deterministic aug draws
        logger = MetricLogger(
            print_freq=int(cfg.log_interval), debug=bool(cfg.debug)
        )
        with mesh:
            for batch in logger.log_every(loader, f"Epoch [{epoch}]"):
                put = lambda t: (
                    jax.tree_util.tree_map(
                        lambda x: jax.device_put(jnp.asarray(x), dsh), t
                    )
                    if t is not None
                    else None
                )
                if kine:
                    state, losses = step_fn(state, rng, put(batch))
                else:
                    state, losses = step_fn(
                        state,
                        rng,
                        put(batch["image"]),
                        put(batch["target"]),
                        put(batch["prev_image"]),
                        put(batch["prev_target"]),
                        put(batch["prev_prev_image"]),
                        put(batch["prev_prev_target"]),
                    )
                scalars = {
                    k: float(v)
                    for k, v in losses.items()
                    if jnp.ndim(v) == 0
                }
                if not np.isfinite(scalars.get("loss", 0.0)):
                    print("Loss is NaN — stopping (reference engine.py:140-143)")
                    sys.exit(1)
                logger.update(**scalars)
                from ..utils import preempt

                if preempt.requested():
                    # finish the in-flight step, checkpoint, and return —
                    # the launcher requeues and auto-resumes (reference
                    # run_with_submitit.py:53-67 checkpoint()+resubmit).
                    # Saved as epoch-1 so the requeued run RE-RUNS the
                    # interrupted epoch instead of skipping its remaining
                    # steps (advisor round-2 medium finding).
                    if ckpt is not None:
                        ckpt.save_preempt(state, epoch)
                        print(
                            "preemption requested: mid-epoch checkpoint "
                            f"saved, requeued run will re-run epoch {epoch}"
                        )
                    return state
                iter_vis = visualizers["train"].get("iter_metrics")
                if iter_vis is not None:
                    iter_vis.plot(
                        [
                            scalars.get(k, 0.0)
                            for k in ("loss", "loss_ce", "loss_bbox", "loss_giou")
                        ],
                        int(state.step),
                    )

        eval_stats = None
        if (
            int(cfg.val_interval) > 0
            and epoch % int(cfg.val_interval) == 0
            and not cfg.eval_only
        ):
            try:
                from .evaluate import evaluate

                dataset_val = build_dataset("val", cfg)
                stats = evaluate(
                    model, criterion, postprocessors, state.params,
                    dataset_val, cfg,
                )
                eval_stats = {
                    "AP": stats["coco_eval_bbox"][0],
                    "AP50": stats["coco_eval_bbox"][1],
                    "mota": stats.get("mota"),
                    "idf1": stats.get("idf1"),
                }
                if cfg.output_dir:
                    import json
                    import os.path as osp

                    with open(
                        osp.join(cfg.output_dir, "metrics.jsonl"), "a"
                    ) as f:
                        f.write(json.dumps({"epoch": epoch, **eval_stats}) + "\n")
            except FileNotFoundError as e:
                print(f"eval skipped (no val data): {e}")
        if ckpt is not None:
            ckpt.save_epoch(state, epoch, eval_stats)
        epoch_vis = visualizers["train"].get("epoch_metrics")
        if epoch_vis is not None and eval_stats:
            epoch_vis.plot(
                [
                    float(eval_stats.get(k) or 0.0)
                    for k in ("AP", "AP50", "mota", "idf1")
                ],
                epoch,
            )
            epoch_vis.save()
        iter_vis = visualizers["train"].get("iter_metrics")
        if iter_vis is not None:
            iter_vis.save()
        if cfg.debug:
            break
    if visualizers.get("sink") is not None:
        visualizers["sink"].close()
    return state


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="train.yaml")
    p.add_argument("--named", nargs="*", default=[])
    p.add_argument("overrides", nargs="*", default=[])
    args = p.parse_args(argv)
    cfg = load_config(
        args.config, named=args.named,
        overrides=parse_cli_overrides(args.overrides),
    )
    train(cfg)


if __name__ == "__main__":
    main()
