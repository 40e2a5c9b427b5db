"""Hungarian set matcher, fixed-shape and on-device.

Reference: src/trackformer/models/matcher.py:84-202 (HungarianMatcher) and
:13-81 (BasicBoxHungarianMatcher). The reference builds per-image variable
cost matrices and calls scipy on host; here the cost tensor is a static
[B, N_targets, Q_queries] (note: transposed vs the reference — targets are
rows so the on-device LSAP solver's N <= M precondition holds), constraints
are applied with masked writes, and `solve_lsap_masked` runs inside jit.

Track-query constraints (reference matcher.py:179-196):
- false-positive track-query columns get BIG cost (≙ np.inf),
- a matched track query q with match id m is pinned: row m and column q
  get BIG everywhere except cell (m, q) = -1,
- inactive (padded) track slots also get BIG columns — the reference has
  no such slots because its sequences are physically shorter.

Returns query4target [B, N] int32: the query index matched to each valid
target slot, -1 for invalid slots.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.boxes import box_cxcywh_to_xyxy, generalized_box_iou
from ..ops.lap import solve_lsap_masked

BIG = 1e5


def classification_cost(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    focal_loss: bool,
    focal_alpha: float,
    focal_gamma: float,
) -> jnp.ndarray:
    """[B, Q, C(+1)] logits × [B, N] labels -> [B, N, Q] class cost."""
    if focal_loss:
        prob = jax.nn.sigmoid(logits)  # [B, Q, C]
        neg = (1 - focal_alpha) * prob**focal_gamma * (-jnp.log1p(-prob + 1e-8))
        pos = focal_alpha * (1 - prob) ** focal_gamma * (-jnp.log(prob + 1e-8))
        cost = pos - neg  # [B, Q, C]
    else:
        cost = -jax.nn.softmax(logits, axis=-1)
    # gather the target-class column per target slot -> [B, N, Q]
    return jnp.take_along_axis(
        cost.transpose(0, 2, 1), labels[:, :, None], axis=1
    )


def build_cost_matrix(
    pred_logits: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    targets,
    cost_class: float,
    cost_bbox: float,
    cost_giou: float,
    focal_loss: bool = False,
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
) -> jnp.ndarray:
    """Matching cost [B, N, Q] with track-query constraints applied."""
    b, q, _ = pred_logits.shape
    n = targets.labels.shape[1]

    c_class = classification_cost(
        pred_logits, targets.labels, focal_loss, focal_alpha, focal_gamma
    )
    # L1: [B, N, Q]
    c_bbox = jnp.sum(
        jnp.abs(targets.boxes[:, :, None, :] - pred_boxes[:, None, :, :]), axis=-1
    )
    c_giou = -generalized_box_iou(
        box_cxcywh_to_xyxy(targets.boxes), box_cxcywh_to_xyxy(pred_boxes)
    )
    cost = cost_bbox * c_bbox + cost_class * c_class + cost_giou * c_giou

    t = targets.num_track_slots
    if t > 0:
        active = targets.track_query_mask  # [B, T] (TP + FP)
        fp = targets.track_query_fp_mask
        pinned_slot = active & ~fp & (targets.track_query_match_ids >= 0)

        # column blocks: [B, Q] — True where the query column must be BIG
        col_blocked = jnp.zeros((b, q), bool)
        col_blocked = col_blocked.at[:, :t].set(fp | ~active | pinned_slot)
        # rows: targets owned by a pinned track query
        m_ids = jnp.where(pinned_slot, targets.track_query_match_ids, n)
        row_pinned = (
            jax.nn.one_hot(m_ids, n, dtype=bool).any(axis=1)  # [B, N]
        )
        cost = jnp.where(
            row_pinned[:, :, None] | col_blocked[:, None, :], BIG, cost
        )
        # pin cells (m, slot) to -1
        pin = jax.nn.one_hot(m_ids, n, dtype=jnp.float32)  # [B, T, N]
        pin = pin.transpose(0, 2, 1)  # [B, N, T]
        pin = jnp.pad(pin, ((0, 0), (0, 0), (0, q - t)))
        cost = jnp.where(pin > 0, -1.0, cost)
    return cost


def hungarian_match(
    pred_logits: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    targets,
    cost_class: float = 1.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    focal_loss: bool = False,
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
) -> jnp.ndarray:
    """Match predictions to targets; returns query4target [B, N] (or -1)."""
    cost = build_cost_matrix(
        pred_logits, pred_boxes, targets,
        cost_class, cost_bbox, cost_giou,
        focal_loss, focal_alpha, focal_gamma,
    )
    cost = jax.lax.stop_gradient(cost)
    return solve_lsap_masked(cost, targets.valid)


def box_match(
    det_boxes: jnp.ndarray,
    det_valid: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    cost_bbox: float = 1.0,
    cost_giou: float = 1.0,
    giou_threshold: float | None = None,
) -> jnp.ndarray:
    """KineT detection↔GT matching (reference BasicBoxHungarianMatcher,
    matcher.py:13-81): pure box L1 + GIoU cost; detections too far from any
    GT stay unmatched via the threshold (entries with giou < threshold get
    BIG and the caller filters by cost).

    Returns det4gt [B, Ngt] int32 (detection index per GT slot, -1 invalid).
    """
    c_bbox = jnp.sum(
        jnp.abs(gt_boxes[:, :, None, :] - det_boxes[:, None, :, :]), axis=-1
    )
    giou = generalized_box_iou(
        box_cxcywh_to_xyxy(gt_boxes), box_cxcywh_to_xyxy(det_boxes)
    )
    cost = cost_bbox * c_bbox - cost_giou * giou
    cost = jnp.where(det_valid[:, None, :], cost, BIG)
    if giou_threshold is not None:
        cost = jnp.where(giou < giou_threshold, BIG, cost)
    det4gt = solve_lsap_masked(cost, gt_valid)
    # drop assignments that hit a BIG cell (no feasible detection)
    b_idx = jnp.arange(cost.shape[0])[:, None]
    n_idx = jnp.arange(cost.shape[1])[None, :]
    chosen_cost = cost[b_idx, n_idx, jnp.clip(det4gt, 0)]
    return jnp.where((det4gt >= 0) & (chosen_cost < BIG / 2), det4gt, -1)


def _det4gt_thresholded(
    targets, detections, det_valid, cost_bbox: float, cost_giou: float
) -> jnp.ndarray:
    """box_match + the reference's max_cost gate
    (max_cost = 0.6*cost_bbox - 0.1*cost_giou, matcher.py:585,616-619)."""
    det4gt = box_match(detections, det_valid, targets.boxes, targets.valid,
                       cost_bbox=cost_bbox, cost_giou=cost_giou)
    d = jnp.take_along_axis(detections, jnp.clip(det4gt, 0)[..., None], axis=1)
    l1 = jnp.sum(jnp.abs(d - targets.boxes), axis=-1)
    from ..ops.boxes import box_cxcywh_to_xyxy, elementwise_box_iou

    giou = elementwise_box_iou(
        box_cxcywh_to_xyxy(d), box_cxcywh_to_xyxy(targets.boxes)
    )
    cost = cost_bbox * l1 - cost_giou * giou
    max_cost = -cost_giou * 0.1 + cost_bbox * 0.6
    return jnp.where((det4gt >= 0) & (cost < max_cost), det4gt, -1)


def ordered_match_from_track_ids(
    targets,
    detections: Optional[jnp.ndarray] = None,
    det_valid: Optional[jnp.ndarray] = None,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
) -> jnp.ndarray:
    """Ordered matcher for the encoder-only KineT variant (reference
    OrderDetectionsMatcherEncoder, matcher.py:540-682): predictions live at
    the trail slots, and the kine augmentation already records which target
    each slot owns (track_query_match_ids) — the assignment inverts
    match_ids into query4target [B, N]. A GT NOT owned by any track-query
    slot falls back to its matched DETECTION's slot (reference
    indices_remaining branch, matcher.py:666-676) — this is what gives the
    detection rows positive supervision, without which the tracker can
    never spawn a first track."""
    n = targets.labels.shape[1]
    mids = jnp.where(
        targets.track_query_mask & ~targets.track_query_fp_mask,
        targets.track_query_match_ids,
        n,
    )  # [B, T]
    b, t = mids.shape
    q4t = jnp.full((b, n), -1, jnp.int32)
    slot_ids = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
    q4t = q4t.at[jnp.arange(b)[:, None], mids].set(slot_ids, mode="drop")
    if detections is not None:
        det4gt = _det4gt_thresholded(
            targets, detections, det_valid, cost_bbox, cost_giou
        )
        fallback = jnp.where(det4gt >= 0, t + det4gt, -1)
        q4t = jnp.where(q4t >= 0, q4t, fallback)
    return jnp.where(targets.valid, q4t, -1)


def ordered_match_transformer(
    targets,
    detections: jnp.ndarray,
    det_valid: jnp.ndarray,
    num_track_slots: int,
    n_assign: int = 1,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
) -> jnp.ndarray:
    """Positional matcher for ordered-query KineT transformers (reference
    OrderDetectionsMatcherTransformer1/2, matcher.py:205-537): detections
    are matched to GT by box cost (threshold max_cost = 0.6*cost_bbox -
    0.1*cost_giou), then target n's prediction is the first query of its
    detection's positional group; a track query owning target n overrides
    the positional slot (reference :355-376)."""
    det4gt = _det4gt_thresholded(
        targets, detections, det_valid, cost_bbox, cost_giou
    )
    q4t = jnp.where(det4gt >= 0, num_track_slots + det4gt * n_assign, -1)
    # track-query override
    t = targets.num_track_slots
    if t > 0:
        mids = jnp.where(
            targets.track_query_mask & ~targets.track_query_fp_mask,
            targets.track_query_match_ids,
            targets.labels.shape[1],
        )
        b, _ = mids.shape
        slot_ids = jnp.broadcast_to(
            jnp.arange(t, dtype=jnp.int32)[None], (b, t)
        )
        override = jnp.full_like(q4t, -1)
        override = override.at[jnp.arange(b)[:, None], mids].set(
            slot_ids, mode="drop"
        )
        q4t = jnp.where(override >= 0, override, q4t)
    return jnp.where(targets.valid, q4t, -1)
