"""Set-prediction losses (reference: src/trackformer/models/detr.py:566-888).

Everything is computed with static shapes and masks inside jit:
- the match is query4target [B, N] from the on-device matcher,
- per-query target classes are built with a masked scatter instead of the
  reference's python-list permutation indices (_get_src_permutation_idx),
- `num_boxes` is the global count of valid targets; under data-parallel
  pjit the sum is global automatically (reference all_reduces it,
  detr.py:844-846),
- padded query slots (inactive track-query slots) are excluded from every
  loss via `query_valid` — the reference has no such slots because its
  query sequences are physically shorter.

Losses: CE with eos down-weighting + FP-track-query reweighting
(detr.py:600-644), sigmoid focal (detr.py:646-706), cardinality
(log-only, :708-721), boxes L1+GIoU (:723-761), masks focal+dice (:763-791).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.boxes import box_cxcywh_to_xyxy, generalized_box_iou
from .matcher import hungarian_match


def sigmoid_focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0):
    """Elementwise focal loss on logits (reference util/misc.py sigmoid focal)."""
    prob = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def optax_sigmoid_ce(logits, labels):
    """Numerically stable binary CE with logits."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def dice_loss(logits, targets, num_boxes, valid):
    """Mask dice loss (reference detr_segmentation.py dice_loss)."""
    prob = jax.nn.sigmoid(logits)
    prob = prob.reshape(prob.shape[0], -1)
    targets = targets.reshape(targets.shape[0], -1)
    numerator = 2 * jnp.sum(prob * targets, axis=1)
    denominator = jnp.sum(prob, axis=1) + jnp.sum(targets, axis=1)
    loss = 1 - (numerator + 1) / (denominator + 1)
    return jnp.sum(loss * valid) / num_boxes


def _scatter_per_query(default, q4t, values, valid, num_queries):
    """Scatter values[b, n] to out[b, q4t[b, n]]; invalid slots dropped.

    default: [B, Q(, ...)] initial value; values: [B, N(, ...)].
    """
    b = q4t.shape[0]
    q = jnp.where(valid, q4t, num_queries)  # OOB -> dropped
    return default.at[jnp.arange(b)[:, None], q].set(values, mode="drop")


class SetCriterion:
    """Functional criterion; __call__(outputs, targets) -> dict of losses.

    `outputs` is the model dict: pred_logits [B, Q, C(+1)], pred_boxes
    [B, Q, 4], optional aux_outputs (list of dicts), enc_outputs,
    pred_masks, query_valid [B, Q] bool.
    """

    def __init__(
        self,
        num_classes: int,
        weight_dict: dict,
        eos_coef: float = 0.1,
        losses=("labels", "boxes", "cardinality"),
        focal_loss: bool = False,
        focal_alpha: float = 0.25,
        focal_gamma: float = 2.0,
        tracking: bool = False,
        track_query_false_positive_eos_weight: bool = True,
        cost_class: float = 1.0,
        cost_bbox: float = 5.0,
        cost_giou: float = 2.0,
        matcher_kind: str = "hungarian",
        ordered_n_assign: int = 1,
        ordered_num_track_slots: int = 0,
    ):
        self.num_classes = num_classes
        self.weight_dict = weight_dict
        self.eos_coef = eos_coef
        self.losses = losses
        self.focal_loss = focal_loss
        self.focal_alpha = focal_alpha
        self.focal_gamma = focal_gamma
        self.tracking = tracking
        self.track_fp_eos_weight = track_query_false_positive_eos_weight
        self.cost_class = cost_class
        self.cost_bbox = cost_bbox
        self.cost_giou = cost_giou
        self.matcher_kind = matcher_kind
        self.ordered_n_assign = ordered_n_assign
        self.ordered_num_track_slots = ordered_num_track_slots

    # --- matching -------------------------------------------------------
    def match(self, outputs, targets):
        if self.matcher_kind == "ordered_encoder":
            # encoder-only KineT: targets own their trail-slot predictions;
            # untracked targets fall back to their detection's slot
            # (reference build_matcher dispatch matcher.py:685-712 +
            # OrderDetectionsMatcherEncoder matcher.py:666-676)
            from .matcher import ordered_match_from_track_ids

            return ordered_match_from_track_ids(
                targets,
                outputs.get("detections"),
                outputs.get("det_valid"),
                cost_bbox=self.cost_bbox,
                cost_giou=self.cost_giou,
            )
        if self.matcher_kind == "ordered_transformer":
            # dual-stream KineT with positional query groups (reference
            # OrderDetectionsMatcherTransformer2, matcher.py:205-537);
            # detections pass through the model outputs
            from .matcher import ordered_match_transformer

            return ordered_match_transformer(
                targets,
                outputs["detections"],
                outputs["det_valid"],
                num_track_slots=self.ordered_num_track_slots,
                n_assign=self.ordered_n_assign,
                cost_bbox=self.cost_bbox,
                cost_giou=self.cost_giou,
            )
        return hungarian_match(
            outputs["pred_logits"],
            outputs["pred_boxes"],
            targets,
            self.cost_class,
            self.cost_bbox,
            self.cost_giou,
            self.focal_loss,
            self.focal_alpha,
            self.focal_gamma,
        )

    # --- individual losses ---------------------------------------------
    def _target_classes(self, q4t, targets, num_queries):
        b = q4t.shape[0]
        tc = jnp.full((b, num_queries), self.num_classes, jnp.int32)
        return _scatter_per_query(tc, q4t, targets.labels, targets.valid, num_queries)

    def loss_labels(self, outputs, targets, q4t, num_boxes):
        logits = outputs["pred_logits"]  # [B, Q, C+1]
        b, q, _ = logits.shape
        query_valid = outputs.get("query_valid")
        if query_valid is None:
            query_valid = jnp.ones((b, q), bool)
        tc = self._target_classes(q4t, targets, q)

        empty_weight = jnp.ones(self.num_classes + 1).at[-1].set(self.eos_coef)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tc[..., None], axis=-1)[..., 0]
        w = empty_weight[tc]
        loss_ce = nll * w

        if self.tracking and self.track_fp_eos_weight:
            # FP track queries: drop the eos down-weighting
            # (reference detr.py:623-630)
            t = targets.num_track_slots
            fp = jnp.zeros((b, q), bool).at[:, :t].set(targets.track_query_fp_mask)
            loss_ce = jnp.where(fp, loss_ce / self.eos_coef, loss_ce)
            w = jnp.where(fp, 1.0, w)

        loss_ce = jnp.where(query_valid, loss_ce, 0.0)
        w = jnp.where(query_valid, w, 0.0)
        losses = {"loss_ce": jnp.sum(loss_ce) / jnp.maximum(jnp.sum(w), 1e-6)}

        # class_error (log-only): accuracy over matched queries
        pred = jnp.argmax(logits[..., :-1], axis=-1)
        matched = (tc != self.num_classes) & query_valid
        correct = jnp.sum((pred == tc) & matched)
        total = jnp.maximum(jnp.sum(matched), 1)
        losses["class_error"] = 100.0 * (1.0 - correct / total)
        return losses

    def loss_labels_focal(self, outputs, targets, q4t, num_boxes):
        logits = outputs["pred_logits"]  # [B, Q, C] — no eos column
        b, q, c = logits.shape
        query_valid = outputs.get("query_valid")
        if query_valid is None:
            query_valid = jnp.ones((b, q), bool)
        tc = self._target_classes(q4t, targets, q)
        onehot = jax.nn.one_hot(tc, c, dtype=logits.dtype)  # eos -> all-zero row
        loss = sigmoid_focal_loss(logits, onehot, self.focal_alpha, self.focal_gamma)
        loss = jnp.where(query_valid[..., None], loss, 0.0)
        # reference: mean over queries, sum over batch, /num_boxes, *num_queries
        # (detr.py:672-683) — net: sum over all queries / num_boxes
        loss_ce = jnp.sum(loss) / num_boxes

        pred = jnp.argmax(logits, axis=-1)
        matched = (tc != self.num_classes) & query_valid
        correct = jnp.sum((pred == tc) & matched)
        total = jnp.maximum(jnp.sum(matched), 1)
        return {
            "loss_ce": loss_ce,
            "class_error": 100.0 * (1.0 - correct / total),
        }

    def loss_cardinality(self, outputs, targets, q4t, num_boxes):
        logits = outputs["pred_logits"]
        query_valid = outputs.get("query_valid")
        if query_valid is None:
            query_valid = jnp.ones(logits.shape[:2], bool)
        # reference detr.py:718 counts argmax != last-class as non-empty in
        # BOTH modes (under focal the last class is a real class — the
        # reference keeps the quirk; we match it, the metric is log-only)
        non_empty = jnp.argmax(logits, axis=-1) != logits.shape[-1] - 1
        card_pred = jnp.sum(non_empty & query_valid, axis=1)
        tgt_len = jnp.sum(targets.valid, axis=1)
        err = jnp.mean(jnp.abs(card_pred.astype(jnp.float32) - tgt_len))
        return {"cardinality_error": jax.lax.stop_gradient(err)}

    def loss_boxes(self, outputs, targets, q4t, num_boxes):
        pred = outputs["pred_boxes"]  # [B, Q, 4]
        b, _, _ = pred.shape
        valid = targets.valid & (q4t >= 0)
        q = jnp.clip(q4t, 0)
        src = pred[jnp.arange(b)[:, None], q]  # [B, N, 4]
        l1 = jnp.sum(jnp.abs(src - targets.boxes), axis=-1)
        l1 = jnp.where(valid, l1, 0.0)
        giou_mat = generalized_box_iou(
            box_cxcywh_to_xyxy(src), box_cxcywh_to_xyxy(targets.boxes)
        )
        giou = jnp.diagonal(giou_mat, axis1=1, axis2=2)
        loss_giou = jnp.where(valid, 1.0 - giou, 0.0)
        return {
            "loss_bbox": jnp.sum(l1) / num_boxes,
            "loss_giou": jnp.sum(loss_giou) / num_boxes,
        }

    def loss_masks(self, outputs, targets, q4t, num_boxes):
        """Mask focal+dice on matched queries (reference detr.py:763-791).

        outputs['pred_masks']: [B, Q, Hm, Wm]; targets must carry `masks`
        [B, N, Hm, Wm] at matching resolution (the data pipeline resizes).
        """
        pred_masks = outputs["pred_masks"]
        tgt_masks = getattr(targets, "masks", None)
        if tgt_masks is None:
            return {}
        b = pred_masks.shape[0]
        valid = targets.valid & (q4t >= 0)
        q = jnp.clip(q4t, 0)
        src = pred_masks[jnp.arange(b)[:, None], q]  # [B, N, Hp, Wp]
        # upsample predictions to GT mask resolution (reference detr.py:779)
        if src.shape[-2:] != tgt_masks.shape[-2:]:
            src = jax.image.resize(
                src, (*src.shape[:2], *tgt_masks.shape[-2:]), method="bilinear"
            )
        src = src.reshape(-1, *src.shape[2:])
        tgt = tgt_masks.reshape(-1, *tgt_masks.shape[2:]).astype(src.dtype)
        v = valid.reshape(-1)
        focal = sigmoid_focal_loss(src, tgt)
        focal = jnp.mean(focal.reshape(focal.shape[0], -1), axis=1)
        return {
            "loss_mask": jnp.sum(focal * v) / num_boxes,
            "loss_dice": dice_loss(src, tgt, num_boxes, v),
        }

    # --- top level ------------------------------------------------------
    def get_loss(self, name, outputs, targets, q4t, num_boxes):
        fns = {
            "labels": self.loss_labels_focal if self.focal_loss else self.loss_labels,
            "cardinality": self.loss_cardinality,
            "boxes": self.loss_boxes,
            "masks": self.loss_masks,
        }
        return fns[name](outputs, targets, q4t, num_boxes)

    def __call__(self, outputs, targets):
        num_boxes = jnp.maximum(jnp.sum(targets.valid.astype(jnp.float32)), 1.0)

        q4t = self.match(outputs, targets)
        losses = {}
        for name in self.losses:
            losses.update(self.get_loss(name, outputs, targets, q4t, num_boxes))

        for i, aux in enumerate(outputs.get("aux_outputs", [])):
            aux = dict(aux)
            aux.setdefault("query_valid", outputs.get("query_valid"))
            q4t_i = self.match(aux, targets)
            for name in self.losses:
                if name == "masks":
                    continue
                for k, v in self.get_loss(name, aux, targets, q4t_i, num_boxes).items():
                    if k == "class_error":
                        continue
                    losses[f"{k}_{i}"] = v

        if "enc_outputs" in outputs:
            # two-stage: binary (class-0) targets (reference detr.py:871-886)
            bin_targets = targets.replace(labels=jnp.zeros_like(targets.labels))
            enc = dict(outputs["enc_outputs"])
            q4t_e = self.match(enc, bin_targets)
            for name in self.losses:
                if name == "masks":
                    continue
                for k, v in self.get_loss(
                    name, enc, bin_targets, q4t_e, num_boxes
                ).items():
                    if k == "class_error":
                        continue
                    losses[f"{k}_enc"] = v
        return losses

    def total_loss(self, losses: dict) -> jnp.ndarray:
        """Weighted sum over keys present in weight_dict (the build step
        expands aux-layer '_{i}' and '_enc' suffixes into weight_dict,
        mirroring reference models/__init__.py:127-146)."""
        total = 0.0
        for k, w in self.weight_dict.items():
            if k in losses:
                total = total + w * losses[k]
        return total
