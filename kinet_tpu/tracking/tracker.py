"""Online tracker — the frame-by-frame state machine
(reference: src/trackformer/models/tracker.py:18-561).

TPU-first split of responsibilities:
- the ONLY device work per frame is one jitted fixed-shape forward
  (track-query slots padded to a static maximum; one image-size bucket =
  one compile). The reference also keeps a single forward per frame but
  with dynamic query counts (a fresh CUDA graph each time the count
  changes).
- everything over O(#tracks) state — keep/terminate hysteresis, reid,
  NMS, public-detection filtering, result writing — is host-side numpy,
  mirroring the reference's host-side python.

Key behaviors preserved (file:line refs into the reference tracker.py):
- track queries = live + inactive tracks' last hs_embed + cxcywh-normalized
  boxes (:290-307),
- outputs split into track rows vs new-detection rows by position (:336,421),
- score threshold + steps_termination hysteresis (:344-365),
- inactive reid via the same forward's rows at reid_score_thresh (:367-383),
- track NMS (:401-418); detection NMS with existing tracks pinned by +inf
  score (:491-509),
- public-detection filtering by center distance or IoU >= 0.5 (:127-168),
- reid of new detections vs inactive tracks by embed distance (scipy LSAP)
  or greedy center distance (:170-267),
- per-frame results dict results[id][frame] = {bbox, score, obj_ind}
  (:529-548), inactive aging (:550), prev-feature deque (:76,554).
"""
from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from ..ops.nms import nms_numpy
from ..structs import ImageBatch, Targets


def box_xyxy_to_cxcywh_np(b):
    x0, y0, x1, y1 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1
    )


def clip_boxes_np(b, size_hw):
    h, w = size_hw
    out = b.copy()
    out[..., 0::2] = np.clip(out[..., 0::2], 0, w)
    out[..., 1::2] = np.clip(out[..., 1::2], 0, h)
    return out


@dataclass
class Track:
    """Per-track state (reference tracker.py:1056-1124)."""

    id: int
    pos: np.ndarray  # xyxy absolute
    score: float
    hs_embed: np.ndarray  # last embedding [D]
    obj_ind: int
    count_inactive: int = 0
    count_termination: int = 0
    mask: Optional[np.ndarray] = None
    attention_map: Optional[np.ndarray] = None
    last_pos: list = field(default_factory=list)

    def has_positive_area(self) -> bool:
        return bool(self.pos[2] > self.pos[0] and self.pos[3] > self.pos[1])

    def repeat_last_pos(self):
        if self.last_pos:
            self.last_pos.append(self.last_pos[-1])
        else:
            self.last_pos.append(self.pos.copy())

    def reset_last_pos(self):
        self.last_pos = [self.pos.copy()]


def make_forward_fn(model, params, postprocess, attention_maps=False,
                    spatial_mesh=None):
    """Jitted per-frame forward with padded track-query slots.

    attention_maps: extract the sowed decoder cross-attention weights
    (model built with generate_attention_maps=True) as per-query maps
    [Q, Hf, Wf] (≙ reference forward hooks, tracker.py:39-62).

    spatial_mesh: optional jax Mesh — spatially partition each frame's
    HEIGHT dim over the mesh's `data` axis (parallel/sp.py design; the
    reference binds one stream to one GPU, src/track.py, so single-stream
    latency has a hard single-device floor there). Params must be
    replicated over the mesh; outputs land replicated for the host
    state machine."""

    def _find_sowed(tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                if k == "attention_weights":
                    return v[0] if isinstance(v, (tuple, list)) else v
                found = _find_sowed(v)
                if found is not None:
                    return found
        return None

    import inspect

    call_params = inspect.signature(type(model).__call__).parameters
    model_takes_prev = "prev_features" in call_params
    # encoded-memory caching (cache_prev_encoder): reuse last step's encoder
    # output instead of re-encoding the previous frame every step
    model_caches_memory = bool(getattr(model, "cache_prev_encoder", False))

    def fwd_impl(params, batch, targets, orig_size, prev_features,
                 prev_memory, pos_cache):
        kwargs = {}
        if model_takes_prev:
            kwargs["prev_features"] = prev_features
        if model_caches_memory:
            kwargs["prev_memory"] = prev_memory
            kwargs["pos_cache"] = pos_cache
        if attention_maps:
            out, state = model.apply(
                params, batch, targets, mutable=["intermediates"], **kwargs
            )
        else:
            out = model.apply(params, batch, targets, **kwargs)
        res = postprocess(out, orig_size)
        ret = {
            "scores": res["scores"],
            "labels": res["labels"],
            "boxes": res["boxes"],
            "hs_embed": out["hs_embed"],
            # with memory caching the raw backbone features are not needed
            # across frames — keep only the encoded memory
            "frame_features": (
                None if model_caches_memory else out.get("frame_features")
            ),
            "frame_memory": out.get("frame_memory"),
            "pos_cache": out.get("pos_cache"),
        }
        if "pred_masks" in out:
            # per-query mask probabilities at input resolution
            # (≙ PostProcessSegm, reference detr_segmentation.py:219-253:
            # interpolate the LOGITS bilinearly, THEN sigmoid — the order
            # matters; sigmoid-then-interpolate is not equivalent)
            m = out["pred_masks"]
            h, w = batch.images.shape[1], batch.images.shape[2]
            m = jax.image.resize(m, (*m.shape[:2], h, w), method="bilinear")
            ret["mask_probs"] = jax.nn.sigmoid(m)
        if attention_maps:
            attn = _find_sowed(dict(state["intermediates"]))
            if attn is not None:
                hf, wf = out["memory"].shape[1], out["memory"].shape[2]
                ret["attention_maps"] = attn.mean(axis=1).reshape(
                    attn.shape[0], attn.shape[2], hf, wf
                )
        return ret

    if spatial_mesh is None:
        return jax.jit(fwd_impl)

    # spatially-partitioned single-stream serving: HEIGHT dim split over
    # the mesh's `data` axis (parallel/sp.py). Params/caches replicated;
    # outputs replicated so the host state machine reads whole rows.
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(spatial_mesh, P())
    img_sh = NamedSharding(spatial_mesh, P(None, "data"))
    jit_fwd = jax.jit(fwd_impl, out_shardings=rep)

    def fwd_sp(params, batch, targets, orig_size, prev_features,
               prev_memory, pos_cache):
        if batch.images.sharding != img_sh:
            batch = batch.replace(
                images=jax.device_put(batch.images, img_sh),
                pad_mask=jax.device_put(batch.pad_mask, img_sh),
            )
        with spatial_mesh:
            return jit_fwd(params, batch, targets, orig_size,
                           prev_features, prev_memory, pos_cache)

    return fwd_sp


class Tracker:
    def __init__(
        self,
        model,
        params,
        postprocess,
        tracker_cfg: dict,
        num_object_queries: int,
        num_track_slots: int,
        hidden_dim: int,
        overflow_boxes: bool = False,
        verbose: bool = False,
        logger=None,
        generate_attention_maps: bool = False,
        spatial_mesh=None,
    ):
        self.model = model
        if spatial_mesh is not None:
            from ..parallel.sp import replicate

            params = replicate(spatial_mesh, params)
        self.params = params
        self.generate_attention_maps = generate_attention_maps
        self._fwd = make_forward_fn(
            model, params, postprocess,
            attention_maps=generate_attention_maps,
            spatial_mesh=spatial_mesh,
        )
        self.num_object_queries = num_object_queries
        self.num_track_slots = num_track_slots
        self.hidden_dim = hidden_dim
        self.overflow_boxes = overflow_boxes

        c = tracker_cfg
        self.detection_obj_score_thresh = c["detection_obj_score_thresh"]
        self.track_obj_score_thresh = c["track_obj_score_thresh"]
        self.detection_nms_thresh = c["detection_nms_thresh"]
        self.track_nms_thresh = c["track_nms_thresh"]
        self.public_detections = c.get("public_detections", False)
        self.inactive_patience = float(c.get("inactive_patience", -1))
        self.reid_sim_threshold = c.get("reid_sim_threshold", 0.0)
        self.reid_sim_only = c.get("reid_sim_only", False)
        self.reid_score_thresh = c.get("reid_score_thresh", 0.4)
        self.reid_greedy_matching = c.get("reid_greedy_matching", False)
        self.prev_frame_dist = int(c.get("prev_frame_dist", 1))
        self.steps_termination = int(c.get("steps_termination", 1))
        self._logger = logger or (lambda *a: None)
        self.reset()

    def reset(self, hard: bool = True):
        self.tracks: list[Track] = []
        self.inactive_tracks: list[Track] = []
        self._prev_features = deque([None], maxlen=self.prev_frame_dist)
        self._prev_memory = deque([None], maxlen=self.prev_frame_dist)
        # sine pos embeddings are a pure function of the (per-sequence
        # fixed) pad mask — computed by the first frame, reused after
        self._pos_cache = None
        if hard:
            self.track_num = 0
            self.results = {}
            self.frame_index = 0
            self.num_reids = 0

    # ------------------------------------------------------------------
    def move_tracks_to_inactive(self, to_inactive):
        self.tracks = [t for t in self.tracks if t not in to_inactive]
        for t in to_inactive:
            t.repeat_last_pos()
        self.inactive_tracks += to_inactive

    def add_tracks(self, boxes, scores, hs_embeds, obj_inds, masks=None):
        new_ids = []
        for i in range(len(boxes)):
            self.tracks.append(
                Track(
                    id=self.track_num + i,
                    pos=np.asarray(boxes[i]),
                    score=float(scores[i]),
                    hs_embed=np.asarray(hs_embeds[i]),
                    obj_ind=int(obj_inds[i]),
                    mask=None if masks is None else masks[i],
                )
            )
            new_ids.append(self.track_num + i)
        self.track_num += len(new_ids)
        return new_ids

    def public_detections_mask(self, new_boxes, public_boxes):
        """(reference :127-168)"""
        if not self.public_detections:
            return np.ones(len(new_boxes), bool)
        if len(public_boxes) == 0 or len(new_boxes) == 0:
            return np.zeros(len(new_boxes), bool)
        mask = np.zeros(len(new_boxes), bool)
        if self.public_detections == "center_distance":
            item_size = (new_boxes[:, 2] - new_boxes[:, 0]) * (
                new_boxes[:, 3] - new_boxes[:, 1]
            )
            nc = box_xyxy_to_cxcywh_np(new_boxes)[:, :2]
            pc = box_xyxy_to_cxcywh_np(public_boxes)[:, :2]
            dist = ((nc[:, None] - pc[None]) ** 2).sum(-1)
            for j in range(len(public_boxes)):
                i = int(dist[:, j].argmin())
                if dist[i, j] < item_size[i]:
                    dist[i, :] = 1e18
                    mask[i] = True
        elif self.public_detections == "min_iou_0_5":
            x0 = np.maximum(new_boxes[:, None, 0], public_boxes[None, :, 0])
            y0 = np.maximum(new_boxes[:, None, 1], public_boxes[None, :, 1])
            x1 = np.minimum(new_boxes[:, None, 2], public_boxes[None, :, 2])
            y1 = np.minimum(new_boxes[:, None, 3], public_boxes[None, :, 3])
            inter = np.clip(x1 - x0, 0, None) * np.clip(y1 - y0, 0, None)
            a1 = (new_boxes[:, 2] - new_boxes[:, 0]) * (
                new_boxes[:, 3] - new_boxes[:, 1]
            )
            a2 = (public_boxes[:, 2] - public_boxes[:, 0]) * (
                public_boxes[:, 3] - public_boxes[:, 1]
            )
            iou = inter / np.maximum(a1[:, None] + a2[None] - inter, 1e-9)
            for j in range(len(public_boxes)):
                i = int(iou[:, j].argmax())
                if iou[i, j] >= 0.5:
                    iou[i, :] = 0
                    mask[i] = True
        else:
            raise NotImplementedError(self.public_detections)
        return mask

    def reid(self, new_boxes, new_scores, new_hs, new_masks=None):
        """ReID new detections against inactive tracks (reference :170-267)."""
        self.inactive_tracks = [
            t
            for t in self.inactive_tracks
            if t.has_positive_area() and t.count_inactive <= self.inactive_patience
        ]
        if not self.inactive_tracks or len(new_boxes) == 0:
            return np.ones(len(new_boxes), bool)

        if self.reid_greedy_matching:
            nb = box_xyxy_to_cxcywh_np(new_boxes)
            ib = box_xyxy_to_cxcywh_np(
                np.stack([t.pos for t in self.inactive_tracks])
            )
            dist = ((ib[:, None, :2] - nb[None, :, :2]) ** 2).sum(-1)
            track_size = ib[:, 2] * ib[:, 3]
            item_size = nb[:, 2] * nb[:, 3]
            invalid = (dist > track_size[:, None]) | (dist > item_size[None])
            dist = dist + invalid * 1e18
            rows, cols = [], []
            for i in range(dist.shape[0]):
                j = int(dist[i].argmin())
                if dist[i, j] < 1e16:
                    dist[:, j] = 1e18
                    dist[i, j] = 0.0
                    rows.append(i)
                    cols.append(j)
            rows, cols = np.asarray(rows, int), np.asarray(cols, int)
            dist_mat = dist
        else:
            ie = np.stack([t.hs_embed for t in self.inactive_tracks])
            dist_mat = np.linalg.norm(
                ie[:, None, :] - new_hs[None, :, :], axis=-1
            )
            rows, cols = linear_sum_assignment(dist_mat)

        keep_mask = np.ones(len(new_boxes), bool)
        removed = []
        for r, cidx in zip(rows, cols):
            if dist_mat[r, cidx] <= self.reid_sim_threshold:
                t = self.inactive_tracks[r]
                t.count_inactive = 0
                t.pos = np.asarray(new_boxes[cidx])
                t.score = float(new_scores[cidx])
                t.hs_embed = np.asarray(new_hs[cidx])
                t.reset_last_pos()
                if new_masks is not None:
                    t.mask = new_masks[cidx]
                keep_mask[cidx] = False
                removed.append(t)
                self.tracks.append(t)
                self.num_reids += 1
        for t in removed:
            self.inactive_tracks.remove(t)
        return keep_mask

    # ------------------------------------------------------------------
    def _build_inputs(self, blob: dict) -> dict:
        """Phase 1 of step(): age inactive tracks and stage the padded
        track-query state as host [1, ...] numpy arrays.

        Kept numpy (not device arrays) so BatchedTracker (batched.py) can
        concatenate several trackers' inputs into one batched forward.
        Stashes the track/new-detection row split on self for _consume."""
        self.inactive_tracks = [
            t
            for t in self.inactive_tracks
            if t.has_positive_area() and t.count_inactive <= self.inactive_patience
        ]
        for t in self.tracks:
            t.last_pos.append(t.pos.copy())

        h0, w0 = blob["orig_size"]
        t_slots = self.num_track_slots
        all_tracks = self.tracks + self.inactive_tracks
        num_prev = min(len(all_tracks), t_slots)
        all_tracks = all_tracks[:num_prev]
        self._num_prev = num_prev

        tq_embeds = np.zeros((1, t_slots, self.hidden_dim), np.float32)
        tq_boxes = np.full((1, t_slots, 4), 0.5, np.float32)
        tq_mask = np.zeros((1, t_slots), bool)
        if num_prev:
            boxes_c = box_xyxy_to_cxcywh_np(
                np.stack([t.pos for t in all_tracks])
            ) / np.array([w0, h0, w0, h0], np.float32)
            tq_boxes[0, :num_prev] = boxes_c
            tq_embeds[0, :num_prev] = np.stack([t.hs_embed for t in all_tracks])
            tq_mask[0, :num_prev] = True

        return {
            "images": np.asarray(blob["images"]),
            "pad_mask": np.asarray(blob["pad_mask"]),
            "tq_embeds": tq_embeds,
            "tq_boxes": tq_boxes,
            "tq_mask": tq_mask,
            "orig_size": np.asarray([[float(h0), float(w0)]], np.float32),
        }

    @staticmethod
    def make_device_inputs(inputs: dict):
        """Host [B, ...] input arrays -> (ImageBatch, Targets, orig_size)."""
        b, t_slots, hidden = inputs["tq_embeds"].shape
        batch = ImageBatch(
            images=jnp.asarray(inputs["images"]),
            pad_mask=jnp.asarray(inputs["pad_mask"]),
        )
        targets = Targets.create(
            jnp.zeros((b, 1, 4)), jnp.zeros((b, 1), jnp.int32),
            jnp.zeros((b, 1), bool),
            num_track_queries=t_slots, hidden_dim=hidden,
        ).replace(
            track_query_embeds=jnp.asarray(inputs["tq_embeds"]),
            track_query_boxes=jnp.asarray(inputs["tq_boxes"]),
            track_query_mask=jnp.asarray(inputs["tq_mask"]),
        )
        return batch, targets, jnp.asarray(inputs["orig_size"])

    _ROW_KEYS = ("scores", "labels", "boxes", "hs_embed")
    _ROW_KEYS_OPT = ("attention_maps", "mask_probs")

    def step(self, blob: dict):
        """blob: images [1,H,W,3] (normalized), pad_mask [1,H,W],
        orig_size (h, w), dets [K, 4] public detections (xyxy abs)."""
        inputs = self._build_inputs(blob)
        batch, targets, orig_size = self.make_device_inputs(inputs)

        res = self._fwd(
            self.params, batch, targets, orig_size,
            self._prev_features[0], self._prev_memory[0], self._pos_cache,
        )
        # ONE batched transfer for everything the state machine reads:
        # per-key np.asarray costs one device round-trip EACH (measured
        # 170 -> 90 ms/frame through the remote tunnel, ~4 fewer RTTs;
        # scripts/probe_host_gap.py, PLAN.md round 5)
        fetch = {k: res[k] for k in self._ROW_KEYS}
        for k in self._ROW_KEYS_OPT:
            if k in res:
                fetch[k] = res[k]
        fetched = jax.device_get(fetch)
        out = {k: np.asarray(v[0]) for k, v in fetched.items()}
        self._consume(out, blob)

        if res["frame_features"] is not None:
            self._prev_features.append(res["frame_features"])
        if res.get("frame_memory") is not None:
            self._prev_memory.append(res["frame_memory"])
        if res.get("pos_cache") is not None:
            self._pos_cache = res["pos_cache"]

    def _consume(self, out: dict, blob: dict):
        """Phase 2 of step(): the host state machine over one sequence's
        forward outputs (numpy arrays with the batch row already selected)."""
        h0, w0 = blob["orig_size"]
        t_slots = self.num_track_slots
        num_prev = self._num_prev
        scores = out["scores"]
        labels = out["labels"]
        boxes_all = out["boxes"]
        hs = out["hs_embed"]
        attn_maps = out.get("attention_maps")
        mask_probs = out.get("mask_probs")
        if not self.overflow_boxes:
            boxes_all = clip_boxes_np(boxes_all, (h0, w0))

        # ----- track rows (slots [0:num_prev]) -----
        if num_prev:
            tr_scores = scores[:t_slots]
            tr_boxes = boxes_all[:t_slots]
            tr_labels = labels[:t_slots]
            keep = (tr_scores > self.track_obj_score_thresh) & (tr_labels == 0)

            to_inactive, from_inactive = [], []
            for i, tr in enumerate(self.tracks):
                if i >= num_prev:
                    break
                if keep[i]:
                    tr.score = float(tr_scores[i])
                    tr.hs_embed = hs[i]
                    tr.pos = tr_boxes[i]
                    tr.count_termination = 0
                    if attn_maps is not None:
                        tr.attention_map = attn_maps[i]
                    if mask_probs is not None:
                        tr.mask = mask_probs[i]
                else:
                    tr.count_termination += 1
                    if tr.count_termination >= self.steps_termination:
                        to_inactive.append(tr)

            keep_reid = (tr_scores > self.reid_score_thresh) & (tr_labels == 0)
            for i, tr in enumerate(self.inactive_tracks):
                row = len(self.tracks) + i
                if row >= num_prev:
                    break
                if keep_reid[row]:
                    tr.score = float(tr_scores[row])
                    tr.hs_embed = hs[row]
                    tr.pos = tr_boxes[row]
                    if attn_maps is not None:
                        tr.attention_map = attn_maps[row]
                    if mask_probs is not None:
                        tr.mask = mask_probs[row]
                    from_inactive.append(tr)

            self.num_reids += len(from_inactive)
            for tr in from_inactive:
                self.inactive_tracks.remove(tr)
                self.tracks.append(tr)
            self.move_tracks_to_inactive(to_inactive)

            if self.track_nms_thresh and self.tracks:
                tb = np.stack([t.pos for t in self.tracks])
                ts = np.array([t.score for t in self.tracks])
                keep_idx = set(
                    nms_numpy(tb, ts, self.track_nms_thresh).tolist()
                )
                self.tracks = [
                    t for i, t in enumerate(self.tracks) if i in keep_idx
                ]

        # ----- new detections (object-query rows) -----
        nd_scores = scores[t_slots:]
        nd_boxes = boxes_all[t_slots:]
        nd_labels = labels[t_slots:]
        nd_hs = hs[t_slots:]
        keep = (nd_scores > self.detection_obj_score_thresh) & (nd_labels == 0)
        nd_inds = np.nonzero(keep)[0]
        nd_boxes, nd_scores, nd_hs = nd_boxes[keep], nd_scores[keep], nd_hs[keep]

        pmask = self.public_detections_mask(
            nd_boxes, np.asarray(blob.get("dets", np.zeros((0, 4))))
        )
        nd_boxes, nd_scores, nd_hs, nd_inds = (
            nd_boxes[pmask], nd_scores[pmask], nd_hs[pmask], nd_inds[pmask]
        )

        rmask = self.reid(nd_boxes, nd_scores, nd_hs)
        nd_boxes, nd_scores, nd_hs, nd_inds = (
            nd_boxes[rmask], nd_scores[rmask], nd_hs[rmask], nd_inds[rmask]
        )

        new_ids = self.add_tracks(nd_boxes, nd_scores, nd_hs, nd_inds)
        if mask_probs is not None:
            det_masks = mask_probs[t_slots:]
            for tid, oi in zip(new_ids, nd_inds):
                for tr in self.tracks:
                    if tr.id == tid:
                        tr.mask = det_masks[int(oi)]
        if attn_maps is not None:
            det_maps = attn_maps[t_slots:]
            for tid, oi in zip(new_ids, nd_inds):
                for tr in self.tracks:
                    if tr.id == tid:
                        tr.attention_map = det_maps[int(oi)]

        if self.detection_nms_thresh and self.tracks:
            tb = np.stack([t.pos for t in self.tracks])
            ts = np.array([t.score for t in self.tracks])
            new_mask = np.array([t.id in new_ids for t in self.tracks])
            ts = np.where(~new_mask, np.inf, ts)
            keep_idx = set(nms_numpy(tb, ts, self.detection_nms_thresh).tolist())
            self.tracks = [t for i, t in enumerate(self.tracks) if i in keep_idx]

        # ----- results -----
        # per-pixel mask overlap resolution: background < 0.5, ties to the
        # highest-probability track (reference tracker.py:515-527)
        if mask_probs is not None and self.tracks and any(
            t.mask is not None for t in self.tracks
        ):
            probs = np.stack(
                [
                    t.mask if t.mask is not None
                    else np.zeros(mask_probs.shape[-2:], np.float32)
                    for t in self.tracks
                ]
            )
            winner = probs.argmax(axis=0)
            idx_map = np.arange(probs.shape[0])[:, None, None]
            final = (probs > 0.5) & (idx_map == winner)
            for i, t in enumerate(self.tracks):
                t.mask = final[i]
        for t in self.tracks:
            self.results.setdefault(t.id, {})
            bbox = t.pos if self.overflow_boxes else clip_boxes_np(t.pos, (h0, w0))
            self.results[t.id][self.frame_index] = {
                "bbox": np.asarray(bbox, np.float32),
                "score": float(t.score),
                "obj_ind": int(t.obj_ind),
            }
            if t.mask is not None:
                self.results[t.id][self.frame_index]["mask"] = t.mask
            if t.attention_map is not None:
                self.results[t.id][self.frame_index]["attention_map"] = (
                    t.attention_map
                )

        for t in self.inactive_tracks:
            t.count_inactive += 1
        self.frame_index += 1

        if self.reid_sim_only:
            self.move_tracks_to_inactive(list(self.tracks))

    def get_results(self):
        return self.results
