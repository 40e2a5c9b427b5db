"""Train-time track-query simulation (reference:
src/trackformer/models/detr_tracking.py:16-283, DETRTrackingBase).

The reference runs the model on the previous frame, Hungarian-matches, then
builds a *variable-length* track-query list per image with host-side python
(random FN subset, distance-weighted FP sampling). Here the same semantics
are expressed as a fixed-shape `lax.scan` over T static track slots so the
whole two-forward training step stays one compiled graph:

- slot s < num_kept          : a kept prev-frame track (FN sim drops the rest)
- num_kept <= s < kept+fps   : an injected false positive
- the rest                   : inactive (masked everywhere)

Reference behaviors preserved:
- num_kept ~ U{0..min_b(#prev targets)} shared across the batch
  (detr_tracking.py:43-47),
- num_fps ~ U{0..ceil(fp_prob * num_kept)} shared across the batch (:49-52),
- FN simulation via a random permutation of matched prev targets (:59-77),
- track queries whose track vanished in the current frame are flagged in
  the fal_pos mask (:151-158 — `~target_ind_matching`),
- FP candidates are *unmatched* prev queries sampled with probability ∝
  center distance to a randomly chosen kept track's box, without
  replacement (:94-149). The reference computes dx²+dx² (bug, SURVEY §8.6);
  we implement the evident intent dx²+dy².
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..structs import Targets


def _match_current_ids(prev_tid, cur_track_ids, cur_valid):
    """Index of the current-frame target with this track id, or -1."""
    hits = (cur_track_ids == prev_tid) & cur_valid & (prev_tid >= 0)
    return jnp.where(hits.any(), jnp.argmax(hits), -1).astype(jnp.int32)


def _augment_one(
    rng,
    q4t_prev,  # [Np] query per prev target (-1 invalid)
    prev_valid,  # [Np]
    prev_track_ids,  # [Np]
    prev_hs,  # [Q, D]
    prev_boxes,  # [Q, 4]
    cur_track_ids,  # [N]
    cur_valid,  # [N]
    num_kept,  # scalar int
    num_fps,  # scalar int
    num_slots: int,
    add_false_pos: bool,
):
    np_, = prev_track_ids.shape
    q = prev_boxes.shape[0]
    t = num_slots

    k_perm, k_fp_assoc, k_scan = jax.random.split(rng, 3)

    # random permutation of valid prev targets: invalid sort to the end
    scores = jax.random.uniform(k_perm, (np_,))
    scores = jnp.where(prev_valid & (q4t_prev >= 0), scores, 2.0)
    perm = jnp.argsort(scores)  # [Np] — first entries are the random subset

    # queries already used by matched prev targets are not FP candidates
    used = jnp.zeros((q,), bool)
    matched_q = jnp.where(prev_valid & (q4t_prev >= 0), q4t_prev, q)
    used = used.at[matched_q].set(True, mode="drop")

    # each FP draw is anchored at a random kept track (reference :118-140)
    fp_assoc = jax.random.randint(k_fp_assoc, (t,), 0, jnp.maximum(num_kept, 1))

    def body(carry, s):
        available, key = carry
        key, k_gumbel = jax.random.split(key)

        is_kept = s < num_kept
        is_fp = (s >= num_kept) & (s < num_kept + num_fps) & add_false_pos

        # --- kept branch ---
        tgt_slot = perm[jnp.clip(s, 0, np_ - 1)]
        kept_q = jnp.clip(q4t_prev[tgt_slot], 0)
        match_id = _match_current_ids(
            prev_track_ids[tgt_slot], cur_track_ids, cur_valid
        )

        # --- fp branch: distance-weighted sample over available queries ---
        j = fp_assoc[jnp.clip(s - num_kept, 0, t - 1)]
        anchor_slot = perm[jnp.clip(j, 0, np_ - 1)]
        anchor_q = jnp.clip(q4t_prev[anchor_slot], 0)
        anchor = prev_boxes[anchor_q, :2]
        d = prev_boxes[:, :2] - anchor[None]
        w = jnp.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2) + 1e-8
        logw = jnp.where(available, jnp.log(w), -jnp.inf)
        gumbel = jax.random.gumbel(k_gumbel, (q,))
        fp_q = jnp.argmax(logw + gumbel).astype(jnp.int32)

        q_sel = jnp.where(is_kept, kept_q, jnp.where(is_fp, fp_q, 0))
        active = is_kept | is_fp
        # vanished tracks (kept but unmatched) are flagged like FPs
        fp_flag = active & ~(is_kept & (match_id >= 0))
        match_id = jnp.where(is_kept, match_id, -1)

        available = jnp.where(
            is_fp, available.at[fp_q].set(False), available
        )
        out = (q_sel, active, fp_flag, match_id)
        return (available, key), out

    (_, _), (q_sel, active, fp_flag, match_ids) = lax.scan(
        body, (~used, k_scan), jnp.arange(t)
    )

    embeds = prev_hs[q_sel] * active[:, None]
    boxes = prev_boxes[q_sel] * active[:, None]
    return embeds, lax.stop_gradient(boxes), active, fp_flag, match_ids


def add_track_queries_to_targets(
    rng,
    targets: Targets,
    prev_targets: Targets,
    q4t_prev: jnp.ndarray,  # [B, Np]
    prev_out: dict,
    false_positive_prob: float,
    false_negative_prob: float,
    add_false_pos: bool = True,
) -> Targets:
    """Returns `targets` with the track_query_* fields populated."""
    b, np_ = q4t_prev.shape
    t = targets.num_track_slots
    k_counts, k_fp_counts, k_batch = jax.random.split(rng, 3)

    matched = prev_targets.valid & (q4t_prev >= 0)
    min_matched = jnp.min(jnp.sum(matched, axis=1))
    # batch-shared counts (reference :43-52). false_negative_prob gates the
    # subsetting: with prob 0 every matched prev target becomes a query.
    if false_negative_prob > 0:
        num_kept = jax.random.randint(k_counts, (), 0, min_matched + 1)
    else:
        num_kept = min_matched
    num_kept = jnp.minimum(num_kept, t)
    max_fps = jnp.ceil(false_positive_prob * num_kept).astype(jnp.int32)
    num_fps = jax.random.randint(k_fp_counts, (), 0, max_fps + 1)
    num_fps = jnp.minimum(num_fps, t - num_kept)

    keys = jax.random.split(k_batch, b)
    embeds, boxes, active, fp_flag, match_ids = jax.vmap(
        _augment_one, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None, None, None, None)
    )(
        keys,
        q4t_prev,
        prev_targets.valid,
        prev_targets.track_ids,
        prev_out["hs_embed"],
        prev_out["pred_boxes"],
        targets.track_ids,
        targets.valid,
        num_kept,
        num_fps,
        t,
        add_false_pos,
    )
    return targets.replace(
        track_query_embeds=embeds.astype(jnp.float32),
        track_query_boxes=boxes.astype(jnp.float32),
        track_query_mask=active,
        track_query_fp_mask=fp_flag,
        track_query_match_ids=match_ids,
    )


def tracking_train_forward(
    model,
    params,
    rng,
    batch,
    targets: Targets,
    prev_batch,
    prev_targets: Targets,
    criterion,
    prev_prev_batch=None,
    prev_prev_targets: Targets | None = None,
    false_positive_prob: float = 0.1,
    false_negative_prob: float = 0.4,
    backprop_prev_frame: bool = False,
    deterministic: bool = False,
    dropout_rng=None,
):
    """One tracking training forward (reference detr_tracking.py:220-283):
    prev(-prev) forwards build track queries, the current forward consumes
    them. Returns (outputs, targets-with-track-queries).
    """
    rngs = {"dropout": dropout_rng} if dropout_rng is not None else {}

    def prev_chain(params):
        k1, k2 = jax.random.split(rng)
        pt = prev_targets
        if prev_prev_batch is not None:
            pp_out = model.apply(
                params, prev_prev_batch, None, deterministic=deterministic,
                rngs=rngs,
            )
            q4t_pp = criterion.match(pp_out, prev_prev_targets)
            pt = add_track_queries_to_targets(
                k1, pt, prev_prev_targets, q4t_pp, pp_out,
                false_positive_prob, false_negative_prob, add_false_pos=False,
            )
            kw = {}
            if "frame_features" in pp_out:
                kw["prev_features"] = pp_out["frame_features"]
            prev_out = model.apply(
                params, prev_batch, pt, deterministic=deterministic,
                rngs=rngs, **kw,
            )
        else:
            prev_out = model.apply(
                params, prev_batch, None, deterministic=deterministic, rngs=rngs
            )
        q4t_prev = criterion.match(prev_out, pt)
        aug = add_track_queries_to_targets(
            k2, targets, pt, q4t_prev, prev_out,
            false_positive_prob, false_negative_prob,
        )
        # cache_prev_encoder models emit frame_memory: the current forward
        # reuses the prev forward's encoded memory instead of re-encoding
        # the prev frame (≙ the tracker's inference-time cache)
        prev_mem = prev_out.get("frame_memory")
        return aug, prev_out.get("frame_features"), prev_mem

    if backprop_prev_frame:
        aug_targets, prev_frame_features, prev_memory = prev_chain(params)
    else:
        aug_targets, prev_frame_features, prev_memory = prev_chain(
            jax.lax.stop_gradient(params)
        )
        aug_targets = jax.lax.stop_gradient(aug_targets)
        if prev_frame_features is not None:
            prev_frame_features = jax.lax.stop_gradient(prev_frame_features)
        if prev_memory is not None:
            prev_memory = jax.lax.stop_gradient(prev_memory)

    kw = {}
    if prev_memory is not None:
        kw["prev_memory"] = prev_memory
    elif prev_frame_features is not None:
        kw["prev_features"] = prev_frame_features
    out = model.apply(
        params, batch, aug_targets, deterministic=deterministic, rngs=rngs, **kw
    )
    return out, aug_targets
