"""Box utilities (reference: src/trackformer/util/box_ops.py:9-90).

All functions are pure jnp, operate on the trailing box axis, and broadcast
over any leading batch axes, so they are safe inside jit/vmap/pjit.
Boxes are float arrays [..., 4] in either (cx, cy, w, h) or (x0, y0, x1, y1).
"""
from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], axis=-1
    )


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes [..., 4] -> [...]."""
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def box_iou(a: jnp.ndarray, b: jnp.ndarray):
    """Pairwise IoU of xyxy boxes a [..., N, 4] and b [..., M, 4].

    Returns (iou, union), each [..., N, M]
    (reference util/box_ops.py:19-34 returns the same pair).
    """
    area_a = box_area(a)[..., :, None]
    area_b = box_area(b)[..., None, :]
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a + area_b - inter
    iou = inter / jnp.maximum(union, 1e-9)
    return iou, union


def generalized_box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU of xyxy boxes (reference util/box_ops.py:37-63).

    Unlike the reference we do not assert box validity (asserts do not trace);
    degenerate boxes simply produce small/negative GIoU.
    """
    iou, union = box_iou(a, b)
    lt = jnp.minimum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.maximum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    hull = wh[..., 0] * wh[..., 1]
    return iou - (hull - union) / jnp.maximum(hull, 1e-9)


def elementwise_box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU of aligned box arrays [..., 4] x [..., 4] -> [...] (xyxy)."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a) + box_area(b) - inter
    return inter / jnp.maximum(union, 1e-9)


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """Bounding xyxy boxes of binary masks [N, H, W] -> [N, 4].

    Fixed-shape rewrite of reference util/box_ops.py:66-90: empty masks
    produce zeros (the reference returns zeros(..., 4) only for an empty
    batch; per-mask emptiness here yields a zero box).
    """
    n, h, w = masks.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    m = masks.astype(jnp.float32)
    big = 1e8
    x_min = jnp.min(jnp.where(m > 0, xs, big), axis=(1, 2))
    y_min = jnp.min(jnp.where(m > 0, ys, big), axis=(1, 2))
    x_max = jnp.max(jnp.where(m > 0, xs, -big), axis=(1, 2))
    y_max = jnp.max(jnp.where(m > 0, ys, -big), axis=(1, 2))
    empty = jnp.sum(m, axis=(1, 2)) == 0
    box = jnp.stack([x_min, y_min, x_max, y_max], axis=-1)
    return jnp.where(empty[:, None], 0.0, box)


def box_clip_xyxy(b: jnp.ndarray, size_hw) -> jnp.ndarray:
    """Clip xyxy boxes to image size (h, w)."""
    h, w = size_hw
    x0 = jnp.clip(b[..., 0], 0, w)
    y0 = jnp.clip(b[..., 1], 0, h)
    x1 = jnp.clip(b[..., 2], 0, w)
    y1 = jnp.clip(b[..., 3], 0, h)
    return jnp.stack([x0, y0, x1, y1], axis=-1)
