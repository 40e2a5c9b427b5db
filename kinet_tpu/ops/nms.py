"""Non-maximum suppression.

The reference uses torchvision.ops.nms on GPU inside the host-side tracker
loop (reference tracker.py:401-418, 491-509) over O(#tracks) boxes. Here:

- `nms_numpy`: greedy NMS on host (torchvision-equivalent ordering:
  descending score, suppress IoU > threshold). Used by the tracker, where
  N is tiny and the state machine is host-side anyway.
- `nms_fixed`: fixed-shape on-device variant (returns a keep mask, not a
  dynamic index list) for fully-jitted pipelines.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def iou_matrix_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU of xyxy boxes [N, 4] x [K, 4] -> [N, K]."""
    x0 = np.maximum(a[:, None, 0], b[None, :, 0])
    y0 = np.maximum(a[:, None, 1], b[None, :, 1])
    x1 = np.minimum(a[:, None, 2], b[None, :, 2])
    y1 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(x1 - x0, 0, None) * np.clip(y1 - y0, 0, None)
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(aa[:, None] + ab[None, :] - inter, 1e-9)


def _iou_matrix_np(boxes: np.ndarray) -> np.ndarray:
    return iou_matrix_np(boxes, boxes)


def nms_numpy(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float):
    """Greedy NMS; returns kept indices in descending score order
    (torchvision.ops.nms contract: strictly greater than threshold
    suppresses)."""
    n = len(boxes)
    if n == 0:
        return np.zeros((0,), np.int64)
    order = np.argsort(-scores, kind="stable")
    iou = _iou_matrix_np(boxes.astype(np.float64))
    suppressed = np.zeros(n, bool)
    keep = []
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > iou_threshold
        suppressed[i] = False
    return np.asarray(keep, np.int64)


def nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
              valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """On-device greedy NMS returning a keep mask [N] (fixed shape).

    Sequential over the score-sorted order via lax.fori_loop; intended for
    small N (track/detection counts), where the loop is cheap.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    x0 = jnp.maximum(boxes[:, None, 0], boxes[None, :, 0])
    y0 = jnp.maximum(boxes[:, None, 1], boxes[None, :, 1])
    x1 = jnp.minimum(boxes[:, None, 2], boxes[None, :, 2])
    y1 = jnp.minimum(boxes[:, None, 3], boxes[None, :, 3])
    inter = jnp.clip(x1 - x0, 0) * jnp.clip(y1 - y0, 0)
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    iou = inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-9)

    def body(k, state):
        keep, suppressed = state
        i = order[k]
        is_active = (~suppressed[i]) & valid[i]
        keep = keep.at[i].set(is_active)
        newly = is_active & (iou[i] > iou_threshold)
        suppressed = suppressed | newly
        suppressed = suppressed.at[i].set(~is_active & suppressed[i])
        return keep, suppressed

    keep, _ = jax.lax.fori_loop(
        0, n, body, (jnp.zeros((n,), bool), jnp.zeros((n,), bool))
    )
    return keep
