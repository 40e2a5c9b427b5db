"""The jitted data-parallel train step (reference: engine.py:101-177
train_one_epoch inner loop, restructured as one compiled function).

One call = (optional) prev/prev-prev forwards + track-query injection +
current forward + criterion + grads + optimizer update. Under a Mesh with
the batch sharded on the `data` axis and params replicated, XLA inserts
the gradient all-reduce — the DDP equivalent (reference train.py:89-91).
"""
from __future__ import annotations

import functools
from typing import Optional

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
