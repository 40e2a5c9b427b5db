"""Training state + optimizer with the reference's parameter groups.

Reference param groups (src/train.py:103-117):
- backbone params at lr_backbone (conv1/bn1/layer1 frozen entirely,
  backbone.py:62-70),
- reference_points / sampling_offsets linears at lr * lr_linear_proj_mult,
- everything else at lr,
AdamW(weight_decay) + MultiStepLR drop ×0.1 at lr_drop (train.py:119-124),
global-norm gradient clipping at clip_max_norm (engine.py:145-149).

Implemented with optax.multi_transform over a param-label pytree; the
FrozenBatchNorm buffers get zero lr implicitly by masking ('frozen').
"""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, tx):
        return cls(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def param_labels(params, cfg=None) -> Any:
    """Label each param leaf by its optimizer group, from its path.

    With ``cfg.masks and cfg.freeze_detr`` every leaf outside the mask
    head (bbox_attention / mask_head) is frozen — the reference freezes
    the whole detector before attaching the mask head
    (detr_segmentation.py:30-38)."""
    freeze_detr = bool(
        cfg is not None and cfg.get("masks") and cfg.get("freeze_detr")
    )

    def label(path_elems) -> str:
        segs = [str(getattr(p, "key", p)) for p in path_elems]
        path = "/".join(segs)
        if freeze_detr:
            if "bbox_attention" in path or "mask_head" in path:
                return "base"
            return "frozen"
        # FrozenBatchNorm: weight/bias/running_* are all buffers in the
        # reference (backbone.py:22-58) — never trained
        if any(s in ("bn1", "bn2", "bn3", "downsample_bn") for s in segs):
            return "frozen"
        if "backbone" in path:
            # stem conv + layer1 frozen (reference backbone.py:62-70)
            if "conv1" in segs and not any(s.startswith("layer") for s in segs):
                return "frozen"
            if any(s.startswith("layer1_") for s in segs):
                return "frozen"
            return "backbone"
        if "sampling_offsets" in path or "reference_points" in path:
            return "linear_proj"
        if "track_layer" in path:  # track attention layers (lr_track)
            return "track"
        return "base"

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: label(path), params
    )


def make_lr_schedule(base_lr: float, lr_drop_step: int, overall_steps=None):
    return optax.piecewise_constant_schedule(
        base_lr, {lr_drop_step: 0.1}
    )


def build_optimizer(cfg, params, steps_per_epoch: int = 1000):
    drop_step = int(cfg.lr_drop) * steps_per_epoch

    def adamw(lr):
        return optax.adamw(
            make_lr_schedule(lr, drop_step),
            weight_decay=cfg.weight_decay,
        )

    labels = param_labels(params, cfg)
    tx = optax.multi_transform(
        {
            "base": adamw(cfg.lr),
            "backbone": adamw(cfg.lr_backbone),
            "linear_proj": adamw(cfg.lr * cfg.lr_linear_proj_mult),
            "track": adamw(cfg.get("lr_track", cfg.lr)),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    if cfg.clip_max_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.clip_max_norm), tx)
    return tx


def apply_grads(state: TrainState, grads, tx) -> TrainState:
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(params=new_params, opt_state=new_opt, step=state.step + 1)
