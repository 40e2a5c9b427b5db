"""The jitted data-parallel train step (reference: engine.py:101-177
train_one_epoch inner loop, restructured as one compiled function).

One call = (optional) prev/prev-prev forwards + track-query injection +
current forward + criterion + grads + optimizer update. Under a Mesh with
the batch sharded on the `data` axis and params replicated, XLA inserts
the gradient all-reduce — the DDP equivalent (reference train.py:89-91).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..tracking.train_augment import tracking_train_forward
from .state import TrainState, apply_grads


def make_train_step(model, criterion, tx, cfg):
    tracking = bool(cfg.get("tracking", False))
    fp_prob = float(cfg.get("track_query_false_positive_prob", 0.1))
    fn_prob = float(cfg.get("track_query_false_negative_prob", 0.4))
    backprop_prev = bool(cfg.get("track_backprop_prev_frame", False))
    # bf16 mixed precision: fp32 master params, bf16 compute — the cast is
    # inside the differentiated function so grads come back fp32
    bf16 = cfg.get("compute_dtype", "float32") == "bfloat16"

    def _cast(tree):
        if not bf16:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def loss_fn(master_params, rng, batch, targets, prev_batch, prev_targets,
                prev_prev_batch, prev_prev_targets, dropout_rng):
        params = _cast(master_params)
        if bf16:
            batch = batch.replace(images=batch.images.astype(jnp.bfloat16))
            if prev_batch is not None:
                prev_batch = prev_batch.replace(
                    images=prev_batch.images.astype(jnp.bfloat16)
                )
            if prev_prev_batch is not None:
                prev_prev_batch = prev_prev_batch.replace(
                    images=prev_prev_batch.images.astype(jnp.bfloat16)
                )
        if tracking and prev_batch is not None:
            out, aug_targets = tracking_train_forward(
                model, params, rng, batch, targets, prev_batch, prev_targets,
                criterion,
                prev_prev_batch=prev_prev_batch,
                prev_prev_targets=prev_prev_targets,
                false_positive_prob=fp_prob,
                false_negative_prob=fn_prob,
                backprop_prev_frame=backprop_prev,
                deterministic=False,
                dropout_rng=dropout_rng,
            )
        else:
            out = model.apply(
                params, batch, targets, deterministic=False,
                rngs={"dropout": dropout_rng},
            )
            aug_targets = targets
        losses = criterion(out, aug_targets)
        return criterion.total_loss(losses), losses

    @jax.jit
    def train_step(state: TrainState, rng, batch, targets,
                   prev_batch=None, prev_targets=None,
                   prev_prev_batch=None, prev_prev_targets=None):
        rng_aug, rng_drop = jax.random.split(jax.random.fold_in(rng, state.step))
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, rng_aug, batch, targets, prev_batch, prev_targets,
            prev_prev_batch, prev_prev_targets, rng_drop,
        )
        new_state = apply_grads(state, grads, tx)
        losses["loss"] = total
        return new_state, losses

    return train_step


def make_eval_step(model, criterion, postprocessors):
    @jax.jit
    def eval_step(params, batch, targets, target_sizes):
        out = model.apply(params, batch, targets, deterministic=True)
        losses = criterion(out, targets)
        results = postprocessors["bbox"](out, target_sizes)
        return losses, results

    return eval_step


def make_kine_train_step(model, criterion, tx, cfg):
    """KineT training step (reference KinetTrackingBase2.forward,
    detr_tracking.py:854-872): trail augmentation (no prev-frame forward)
    + current forward + criterion + update, one jit."""
    from ..structs import KineBatch, Targets
    from ..tracking.kine_augment import add_kine_track_queries

    # trail_enc == 0 -> raw trails (use_encoding_tracklets=False, the
    # reference's default)
    trail_enc = (
        int(cfg.encoding_dim_tracklets)
        if cfg.get("use_encoding_tracklets", False)
        else 0
    )
    ratio = float(cfg.get("ratio_add_tracklets", 1.0))
    rand_count = bool(cfg.get("kine_random_tracklet_count", False))
    ratio_dets = float(cfg.get("ratio_add_detections", 0.5))

    def loss_fn(params, rng, kb, targets, trails, dropout_rng):
        aug = add_kine_track_queries(
            rng, targets, trails, kb.detections, kb.metadata,
            ~kb.pad_mask, trail_enc_dim=trail_enc,
            ratio_add_tracklets=ratio,
            random_count=rand_count,
            ratio_add_detections=ratio_dets,
        )
        aug = jax.lax.stop_gradient(aug)
        out = model.apply(
            params, kb, aug, deterministic=False,
            rngs={"dropout": dropout_rng},
        )
        losses = criterion(out, aug)
        return criterion.total_loss(losses), losses

    @jax.jit
    def train_step(state, rng, batch_dict):
        kb = KineBatch(
            detections=batch_dict["detections"],
            metadata=batch_dict["metadata"],
            pad_mask=batch_dict["det_pad_mask"],
        )
        t = int(cfg.max_track_queries)
        per_frame = 4 * trail_enc if trail_enc else 4
        e_dim = (
            int(cfg.track_prev_frame_range) * per_frame
            + int(cfg.track_prev_frame_range)
            * (2 if cfg.use_class else 1)
        )
        targets = Targets.create(
            batch_dict["boxes"], batch_dict["labels"], batch_dict["valid"],
            batch_dict["track_ids"], num_track_queries=t, hidden_dim=e_dim,
        )
        rng_aug, rng_drop = jax.random.split(
            jax.random.fold_in(rng, state.step)
        )
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, rng_aug, kb, targets,
            batch_dict["trails"].transpose(0, 1, 2, 3), rng_drop,
        )
        new_state = apply_grads(state, grads, tx)
        losses["loss"] = total
        return new_state, losses

    return train_step
