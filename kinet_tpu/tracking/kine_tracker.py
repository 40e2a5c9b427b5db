"""Kinematic online tracker (reference:
src/trackformer/models/tracker.py:580-1053, TrackerKinematic + TrackKinematic).

Image-free tracking: per frame the model consumes the external detections
(KineBatch) and sine-encoded trails of each live/inactive track as track
queries. State per track is a fixed-length trail of normalized cxcywh
positions + a metadata (confidence) trail; new tracks start from a
pseudo-trail of their detection repeated (reference generate_new_tracks,
:892-920). No embed reid / masks / attention maps (reference parity).

The reference's `repeat_last_pos` vs `repeat_last_state` naming drift
(SURVEY §8.8 — AttributeError for inactive kinematic tracks) is fixed by
a single `repeat_last_state` implementation.
"""
from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import iou_matrix_np, nms_numpy
from ..structs import KineBatch, Targets
from .kine_augment import sine_encode_trail
from .tracker import Tracker, clip_boxes_np


def pseudo_trail(rel_box: np.ndarray, n_frames: int) -> np.ndarray:
    """Repeat a relative box over the trail (reference
    generate_pseudo_tracklets)."""
    return np.tile(rel_box[None], (n_frames, 1)).astype(np.float32)


@dataclass
class TrackKinematic:
    id: int
    pos: np.ndarray  # xyxy absolute
    pos_rel: np.ndarray  # cxcywh normalized
    score: float
    obj_ind: int
    trail: deque = field(default_factory=deque)  # of pos_rel
    meta_trail: deque = field(default_factory=deque)  # of metadata rows
    count_inactive: int = 0
    count_termination: int = 0

    def has_positive_area(self):
        return bool(self.pos[2] > self.pos[0] and self.pos[3] > self.pos[1])

    def update_state(self, pos, pos_rel, score, metadata):
        self.pos = pos
        self.pos_rel = pos_rel
        self.score = float(score)
        self.trail.append(np.asarray(pos_rel))
        self.meta_trail.append(np.asarray(metadata))

    def repeat_last_state(self):
        if self.trail:
            self.trail.append(self.trail[-1])
            self.meta_trail.append(self.meta_trail[-1])

    def get_trail(self, n_frames: int):
        """Last n positions, padded at the front with the oldest
        (reference Track.get_tracklets, tracker.py:1026-1045)."""
        trail = list(self.trail)[-n_frames:]
        meta = list(self.meta_trail)[-n_frames:]
        while len(trail) < n_frames:
            trail.insert(0, trail[0] if trail else self.pos_rel)
            meta.insert(0, meta[0] if meta else np.zeros_like(meta[0]))
        return np.stack(trail), np.stack(meta)


class TrackerKinematic(Tracker):
    def __init__(
        self,
        model,
        params,
        postprocess,
        tracker_cfg: dict,
        num_object_queries: int,
        num_track_slots: int,
        trail_len: int,
        trail_enc_dim: int,
        meta_dim: int = 1,
        n_classes: int = 1,
        overflow_boxes: bool = False,
        logger=None,
    ):
        super().__init__(
            model, params, postprocess, tracker_cfg,
            num_object_queries, num_track_slots,
            hidden_dim=trail_len * (4 * trail_enc_dim if trail_enc_dim
                                    else 4) + trail_len * meta_dim,
            overflow_boxes=overflow_boxes, logger=logger,
        )
        self.trail_len = trail_len
        self.trail_enc_dim = trail_enc_dim
        self.meta_dim = meta_dim
        self.n_classes = n_classes
        self.snap_to_detections = bool(
            tracker_cfg.get("snap_to_detections", False)
        )
        # Spawn-row layout after the track slots: the encoder-only
        # associator outputs ONE ROW PER INPUT DETECTION (padding rows are
        # key-masked noise — only the blob's real detections are spawn
        # candidates), while the query-based models (KineT /
        # KinematicDetectorTransformer) output num_object_queries DECODER
        # QUERIES there in arbitrary order — every query row is a spawn
        # candidate (≙ reference tracker.py:269-344, which slices all
        # object-query rows as detections). Slicing only the first
        # _num_dets query rows silently dropped most spawn candidates for
        # the dual-stream model (gate: one object never spawned).
        self.rows_per_detection = (
            type(model).__name__ == "KinematicDetectorEncoder"
        )

        @jax.jit
        def fwd(params, kb, targets, orig_size):
            out = model.apply(params, kb, targets)
            res = postprocess(out, orig_size)
            return {
                "scores": res["scores"],
                "labels": res["labels"],
                "boxes": res["boxes"],
                "rel_boxes": out["pred_boxes"],
            }

        self._fwd_kine = fwd

    def _encode_trails(self, tracks):
        t_slots = self.num_track_slots
        e = self.hidden_dim
        embeds = np.zeros((1, t_slots, e), np.float32)
        mask = np.zeros((1, t_slots), bool)
        n = min(len(tracks), t_slots)
        if n:
            trails = np.stack([t.get_trail(self.trail_len)[0] for t in tracks[:n]])
            metas = np.stack([t.get_trail(self.trail_len)[1] for t in tracks[:n]])
            flat = trails.reshape(n, self.trail_len * 4)
            if self.trail_enc_dim:
                enc = np.asarray(
                    sine_encode_trail(jnp.asarray(flat), self.trail_enc_dim)
                )
            else:  # raw trails (use_encoding_tracklets=False default)
                enc = flat.astype(np.float32)
            embeds[0, :n] = np.concatenate(
                [enc, metas[:, :, : self.meta_dim].reshape(n, -1)], axis=-1
            )
            mask[0, :n] = True
        return embeds, mask, n

    def _build_inputs(self, blob: dict) -> dict:
        """Phase 1 of step(): age inactive tracks, stage padded detection +
        trail-encoded track-query arrays as host [1, ...] numpy (overrides
        the image tracker's; used by BatchedTrackerKinematic)."""
        self.inactive_tracks = [
            t
            for t in self.inactive_tracks
            if t.has_positive_area() and t.count_inactive <= self.inactive_patience
        ]
        h0, w0 = blob["orig_size"]
        t_slots = self.num_track_slots
        all_tracks = (self.tracks + self.inactive_tracks)[:t_slots]

        embeds, mask, num_prev = self._encode_trails(all_tracks)
        self._num_prev = num_prev

        max_det = blob.get("max_detections", 60)
        k = len(blob["detections"])
        dets = np.zeros((1, max_det, 4), np.float32)
        meta = np.zeros((1, max_det, self.meta_dim), np.float32)
        det_pad = np.ones((1, max_det), bool)
        kk = min(k, max_det)
        self._num_dets = kk
        if kk:
            dets[0, :kk] = blob["detections"][:kk, :4]
            meta[0, :kk] = np.asarray(blob["metadata"])[:kk, : self.meta_dim]
            det_pad[0, :kk] = False
        return {
            "detections": dets,
            "metadata": meta,
            "det_pad": det_pad,
            "tq_embeds": embeds,
            "tq_mask": mask,
            "orig_size": np.asarray([[float(h0), float(w0)]], np.float32),
        }

    @staticmethod
    def make_device_inputs(inputs: dict):
        """Host [B, ...] input arrays -> (KineBatch, Targets, orig_size)."""
        b, t_slots, hidden = inputs["tq_embeds"].shape
        kb = KineBatch(
            detections=jnp.asarray(inputs["detections"]),
            metadata=jnp.asarray(inputs["metadata"]),
            pad_mask=jnp.asarray(inputs["det_pad"]),
        )
        targets = Targets.create(
            jnp.zeros((b, 1, 4)), jnp.zeros((b, 1), jnp.int32),
            jnp.zeros((b, 1), bool),
            num_track_queries=t_slots, hidden_dim=hidden,
        ).replace(
            track_query_embeds=jnp.asarray(inputs["tq_embeds"]),
            track_query_mask=jnp.asarray(inputs["tq_mask"]),
        )
        return kb, targets, jnp.asarray(inputs["orig_size"])

    _ROW_KEYS = ("scores", "labels", "boxes", "rel_boxes")

    def step(self, blob: dict):
        """blob: detections [K, 4] cxcywh normalized, metadata [K, M],
        orig_size (h, w)."""
        inputs = self._build_inputs(blob)
        kb, targets, orig_size = self.make_device_inputs(inputs)
        res = self._fwd_kine(self.params, kb, targets, orig_size)
        # one batched transfer (one RTT, not one per key — probe_host_gap)
        fetched = jax.device_get({k: res[k] for k in self._ROW_KEYS})
        self._consume({k: np.asarray(v[0]) for k, v in fetched.items()}, blob)

    def _num_spawn_rows(self) -> int:
        return (
            self._num_dets
            if self.rows_per_detection
            else self.num_object_queries
        )

    def _consume(self, out: dict, blob: dict):
        """Phase 2 of step(): the kinematic host state machine over one
        sequence's forward outputs (numpy, row-selected)."""
        h0, w0 = blob["orig_size"]
        t_slots = self.num_track_slots
        num_prev = self._num_prev
        scores = out["scores"]
        labels = out["labels"]
        boxes_abs = out["boxes"]
        rel = out["rel_boxes"]
        if not self.overflow_boxes:
            boxes_abs = clip_boxes_np(boxes_abs, (h0, w0))
            rel = rel.clip(0.0, 1.0)
        if self.snap_to_detections:
            # snap each output box to its best-IoU PUBLIC detection: the
            # kinematic model is an ASSOCIATOR over external detections —
            # its learned box head interpolates between the trail tail and
            # the detection (visible as lag on fast objects at small
            # training scale), while the association itself is what the
            # row decides. Snapping reports the associated detection's box
            # (tracking-by-detection output; not in the reference, which
            # reports the raw head output — flag default-off).
            dets_rel = np.asarray(blob["detections"], np.float32)
            if len(dets_rel):
                scale = np.array([w0, h0, w0, h0], np.float32)
                half = dets_rel[:, 2:] / 2
                dets_xyxy = (
                    np.concatenate(
                        [dets_rel[:, :2] - half, dets_rel[:, :2] + half], 1
                    )
                    * scale
                )
                boxes_abs = np.array(boxes_abs)  # writable copies (the raw
                rel = np.array(rel)  # forward outputs can be read-only)
                # TRACK rows: greedy ONE-TO-ONE in descending IoU order so
                # two tracks cannot both report the same box (a duplicate
                # is a guaranteed FP, and track-NMS could then delete the
                # true track). Exclusivity must stay WITHIN the track rows:
                # detection rows output near-copies of the detections and
                # would otherwise win every claim, starving the tracks.
                iou = iou_matrix_np(boxes_abs[:num_prev], dets_xyxy)
                order = np.argsort(iou.max(axis=1))[::-1]
                claimed = np.zeros(len(dets_xyxy), bool)
                for r in order:
                    k_best = int(np.argmax(np.where(claimed, -1.0, iou[r])))
                    if claimed[k_best] or iou[r, k_best] < 0.3:
                        continue
                    claimed[k_best] = True
                    boxes_abs[r] = dets_xyxy[k_best]
                    rel[r] = dets_rel[k_best]
                # DETECTION rows: independent snap (their boxes are
                # near-copies of their own detection; duplicates among
                # spawns are handled by detection-NMS)
                lo, hi = t_slots, t_slots + self._num_spawn_rows()
                if hi > lo:
                    iou_d = iou_matrix_np(boxes_abs[lo:hi], dets_xyxy)
                    best = iou_d.argmax(axis=1)
                    ok = iou_d[np.arange(hi - lo), best] >= 0.3
                    boxes_abs[lo:hi] = np.where(
                        ok[:, None], dets_xyxy[best], boxes_abs[lo:hi]
                    )
                    rel[lo:hi] = np.where(
                        ok[:, None], dets_rel[best], rel[lo:hi]
                    )

        # ----- track rows -----
        if num_prev:
            tr_scores = scores[:t_slots]
            tr_boxes = boxes_abs[:t_slots]
            tr_rel = rel[:t_slots]
            tr_labels = labels[:t_slots]
            keep = (tr_scores > self.track_obj_score_thresh) & (
                tr_labels < self.n_classes
            )
            to_inactive, from_inactive = [], []
            for i, tr in enumerate(self.tracks):
                if i >= num_prev:
                    break
                if keep[i]:
                    tr.update_state(
                        tr_boxes[i], tr_rel[i], tr_scores[i],
                        np.array([tr_scores[i], tr_labels[i]])[: self.meta_dim],
                    )
                    tr.count_termination = 0
                else:
                    tr.count_termination += 1
                    if tr.count_termination >= self.steps_termination:
                        to_inactive.append(tr)
            keep_reid = (tr_scores > self.reid_score_thresh) & (
                tr_labels < self.n_classes
            )
            for i, tr in enumerate(self.inactive_tracks):
                row = len(self.tracks) + i
                if row >= num_prev:
                    break
                if keep_reid[row]:
                    tr.update_state(
                        tr_boxes[row], tr_rel[row], tr_scores[row],
                        np.array([tr_scores[row], tr_labels[row]])[: self.meta_dim],
                    )
                    # count_inactive deliberately NOT reset: reference
                    # track-row revival keeps the stale count in BOTH its
                    # trackers (tracker.py:726-729 kinematic, :367-386
                    # image; only embed-distance reid resets it, :240) —
                    # matches our image tracker's behavior
                    from_inactive.append(tr)
            self.num_reids += len(from_inactive)
            for tr in from_inactive:
                self.inactive_tracks.remove(tr)
                self.tracks.append(tr)
            self.tracks = [t for t in self.tracks if t not in to_inactive]
            for t in to_inactive:
                t.repeat_last_state()
            self.inactive_tracks += to_inactive

            if self.track_nms_thresh and self.tracks:
                tb = np.stack([t.pos for t in self.tracks])
                ts = np.array([t.score for t in self.tracks])
                keep_idx = set(nms_numpy(tb, ts, self.track_nms_thresh).tolist())
                self.tracks = [
                    t for i, t in enumerate(self.tracks) if i in keep_idx
                ]

        # ----- new detections (rows after the track slots) -----
        # encoder-only: only the blob's REAL detections (rows beyond
        # _num_dets are padding whose scores are meaningless — key-masked
        # at train and inference time); query-based models: ALL object-
        # query rows (see rows_per_detection in __init__)
        nd_hi = t_slots + self._num_spawn_rows()
        nd_scores = scores[t_slots:nd_hi]
        nd_labels = labels[t_slots:nd_hi]
        nd_boxes = boxes_abs[t_slots:nd_hi]
        nd_rel = rel[t_slots:nd_hi]
        keep = (nd_scores > self.detection_obj_score_thresh) & (
            nd_labels < self.n_classes
        )
        nd_inds = np.nonzero(keep)[0]
        nd_boxes, nd_scores, nd_rel, nd_labels = (
            nd_boxes[keep], nd_scores[keep], nd_rel[keep], nd_labels[keep]
        )
        pmask = self.public_detections_mask(
            nd_boxes, np.asarray(blob.get("dets", np.zeros((0, 4))))
        )
        nd_boxes, nd_scores, nd_rel, nd_labels, nd_inds = (
            nd_boxes[pmask], nd_scores[pmask], nd_rel[pmask],
            nd_labels[pmask], nd_inds[pmask],
        )

        new_ids = []
        for i in range(len(nd_boxes)):
            tr = TrackKinematic(
                id=self.track_num + i,
                pos=nd_boxes[i],
                pos_rel=nd_rel[i],
                score=float(nd_scores[i]),
                obj_ind=int(nd_inds[i]),
            )
            meta_row = np.array([nd_scores[i], nd_labels[i] / max(self.n_classes, 1)])[
                : self.meta_dim
            ]
            for p in pseudo_trail(nd_rel[i], self.trail_len):
                tr.trail.append(p)
                tr.meta_trail.append(meta_row)
            self.tracks.append(tr)
            new_ids.append(tr.id)
        self.track_num += len(new_ids)

        if self.detection_nms_thresh and self.tracks:
            tb = np.stack([t.pos for t in self.tracks])
            ts = np.array([t.score for t in self.tracks])
            new_mask = np.array([t.id in new_ids for t in self.tracks])
            ts = np.where(~new_mask, np.inf, ts)
            keep_idx = set(nms_numpy(tb, ts, self.detection_nms_thresh).tolist())
            self.tracks = [t for i, t in enumerate(self.tracks) if i in keep_idx]

        for t in self.tracks:
            self.results.setdefault(t.id, {})
            bbox = t.pos if self.overflow_boxes else clip_boxes_np(t.pos, (h0, w0))
            self.results[t.id][self.frame_index] = {
                "bbox": np.asarray(bbox, np.float32),
                "score": float(t.score),
                "obj_ind": int(t.obj_ind),
            }
        for t in self.inactive_tracks:
            t.count_inactive += 1
        self.frame_index += 1
