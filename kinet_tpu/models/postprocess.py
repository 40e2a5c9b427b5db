"""Output post-processing (reference: detr.py:891-934 PostProcess and
deformable_detr.py:286-334 DeformablePostProcess).

Converts model outputs to scored absolute-coordinate results; stays
fully batched/jittable ([B, Q, ...] arrays, no per-image python lists).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.boxes import box_cxcywh_to_xyxy


def scale_boxes(boxes: jnp.ndarray, target_sizes: jnp.ndarray) -> jnp.ndarray:
    """cxcywh normalized [B, Q, 4] -> absolute xyxy given sizes [B, 2] (h, w)."""
    xyxy = box_cxcywh_to_xyxy(boxes)
    h, w = target_sizes[:, 0], target_sizes[:, 1]
    scale = jnp.stack([w, h, w, h], axis=-1)[:, None, :]
    return xyxy * scale


def postprocess(outputs: dict, target_sizes: jnp.ndarray) -> dict:
    """Softmax variant (reference detr.py:904-934): scores/labels from
    softmax over classes excl. no-object; also returns scores_no_object."""
    logits, boxes = outputs["pred_logits"], outputs["pred_boxes"]
    prob = jax.nn.softmax(logits, axis=-1)
    scores = jnp.max(prob[..., :-1], axis=-1)
    labels = jnp.argmax(prob[..., :-1], axis=-1)
    return {
        "scores": scores,
        "labels": labels,
        "boxes": scale_boxes(boxes, target_sizes),
        "scores_no_object": prob[..., -1],
    }


def postprocess_focal(outputs: dict, target_sizes: jnp.ndarray) -> dict:
    """Sigmoid/focal variant (reference deformable_detr.py:289-334): per-query
    max sigmoid score (the reference's commented-out top-100 flatten is not
    used in tracking; it takes per-query max like this)."""
    logits, boxes = outputs["pred_logits"], outputs["pred_boxes"]
    prob = jax.nn.sigmoid(logits)
    scores = jnp.max(prob, axis=-1)
    labels = jnp.argmax(prob, axis=-1)
    return {
        "scores": scores,
        "labels": labels,
        "boxes": scale_boxes(boxes, target_sizes),
        "scores_no_object": 1.0 - scores,
    }


def build_postprocessors(cfg):
    fn = postprocess_focal if cfg.focal_loss else postprocess
    return {"bbox": fn}
