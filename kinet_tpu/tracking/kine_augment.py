"""KineT train-time track-query construction (reference:
src/trackformer/models/detr_tracking.py:524-872, KinetTrackingBase2).

Fixed-shape jittable rewrite. Per batch:
1. match external detections to GT boxes (BasicBoxHungarianMatcher ≙
   `box_match`, reference matcher.py:13-81),
2. replace each matched target's trail tail with its matched detection and
   build a metadata history ~ N(0.9, 0.1) with the detection's confidence
   at the tail (reference :758-775),
3. fill `num_tracklets` slots: a random permutation of real targets first;
   leftover slots get synthetic random tracklets with confidence ≤
   max_confidence_false_positives, flagged as false positives (:807-852),
4. sine-encode trails (SineEncodingTracklet, :286-307) and pack
   [trail_enc | metadata_history] into track_query_embeds.

num_tracklets = ceil(ratio_add_tracklets · max_b(#targets)) in the
reference (:755-757); here the slot count is the static T and the dynamic
count masks slots off.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..structs import Targets


def sine_encode_trail(x: jnp.ndarray, num_pos_feats: int, temperature=10000.0):
    """[..., K] -> [..., K*num_pos_feats] (reference detr_tracking.py:286-307)."""
    t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(t / 2) / num_pos_feats)
    freq = (x[..., None] * 2 * jnp.pi) / dim_t
    emb = jnp.concatenate(
        [jnp.cos(freq[..., 0::2]), jnp.sin(freq[..., 1::2])], axis=-1
    )
    return emb.reshape(*x.shape[:-1], -1)


def generate_pseudo_trail(rng, n, trail_len, wh_max=0.3):
    """Random moving tracklets (reference :777-789)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    wh = jax.random.uniform(k1, (n, 2)) * wh_max + 0.05
    cxcy = jax.random.uniform(k2, (n, 2)) * (1 - wh) + wh / 2
    final = jnp.concatenate([cxcy, wh], axis=1)  # [n, 4]
    base = jnp.broadcast_to(final[:, None, :], (n, trail_len, 4))
    move = jnp.tile(jax.random.uniform(k3, (n, 2)) * wh_max / 5, (1, 2))
    steps = jnp.arange(trail_len, dtype=jnp.float32)[None, :, None]
    return base + move[:, None, :] * steps


def add_kine_track_queries(
    rng,
    targets: Targets,
    trails: jnp.ndarray,  # [B, N, L, 4] normalized cxcywh
    detections: jnp.ndarray,  # [B, Nd, 4]
    det_metadata: jnp.ndarray,  # [B, Nd, M]
    det_valid: jnp.ndarray,  # [B, Nd]
    trail_enc_dim: int,
    ratio_add_tracklets: float = 1.0,
    max_confidence_false_positives: float = 0.5,
    random_count: bool = False,
    ratio_add_detections: float = 0.5,
) -> Targets:
    from ..models.matcher import box_match

    b, n, l, _ = trails.shape
    m = det_metadata.shape[-1]
    t = targets.num_track_slots

    det4gt = box_match(
        detections, det_valid, targets.boxes, targets.valid
    )  # [B, N]

    n_targets = jnp.sum(targets.valid, axis=1)  # [B]
    num_slots = jnp.ceil(
        ratio_add_tracklets * jnp.max(n_targets)
    ).astype(jnp.int32)
    num_slots = jnp.minimum(num_slots, t)

    k_meta, k_perm, k_fp, k_conf = jax.random.split(rng, 4)
    if random_count:
        # randomized tracklet count incl. ZERO (the reference dual-stream
        # variant's get_minimun_tracks, detr_tracking.py:385-389: randint
        # over [0, ratio*min_matched]) — covers the tracker's first-frame
        # input (no trails at all) and leaves untracked targets to the
        # ordered matcher's detection-slot fallback
        num_slots = jax.random.randint(k_fp, (), 0, num_slots + 1)

    # 2. tail replacement + metadata history. Only ratio_add_detections of
    # the matched trails get their tail snapped to the CURRENT detection
    # (reference detr_tracking.py:337,369: ratio_add_detections=0.5) — the
    # rest keep the PREVIOUS position as tail, forcing the model to
    # predict the current position from history + detection tokens instead
    # of echoing the tail (echoing makes the tracker lag moving objects).
    matched = det4gt >= 0
    if ratio_add_detections < 1.0:
        picked = (
            jax.random.uniform(k_conf, matched.shape) < ratio_add_detections
        )
        matched = matched & picked
    det_idx = jnp.clip(det4gt, 0)
    det_boxes = jnp.take_along_axis(
        detections, det_idx[..., None], axis=1
    )  # [B, N, 4]
    tails = jnp.where(matched[..., None], det_boxes, trails[:, :, -1, :])
    trails = trails.at[:, :, -1, :].set(tails)
    meta_hist = (
        jax.random.normal(k_meta, (b, n, l, m)) * 0.1 + 0.9
    )
    det_meta = jnp.take_along_axis(det_metadata, det_idx[..., None], axis=1)
    meta_tail = jnp.where(matched[..., None], det_meta, meta_hist[:, :, -1, :])
    meta_hist = meta_hist.at[:, :, -1, :].set(meta_tail)

    # 3. slot filling per image
    def fill_one(key, trails_i, meta_i, valid_i, n_valid):
        kp, kf, kc = jax.random.split(key, 3)
        score = jnp.where(valid_i, jax.random.uniform(kp, (n,)), 2.0)
        perm = jnp.argsort(score)  # valid targets first, random order
        slots = jnp.arange(t)
        take = jnp.minimum(n_valid, num_slots)
        is_real = slots < take
        is_fp = (slots >= take) & (slots < num_slots)
        src = perm[jnp.clip(slots, 0, n - 1)]
        trail_slots = trails_i[src]  # [T, L, 4]
        meta_slots = meta_i[src]  # [T, L, M]
        pseudo = generate_pseudo_trail(kf, t, l)
        fp_conf = (
            jax.random.uniform(kc, (t, l, 1)) * max_confidence_false_positives
        )
        fp_meta = jnp.concatenate(
            [fp_conf, jnp.zeros((t, l, m - 1))], axis=-1
        ) if m > 1 else fp_conf
        trail_slots = jnp.where(is_fp[:, None, None], pseudo, trail_slots)
        meta_slots = jnp.where(is_fp[:, None, None], fp_meta, meta_slots)
        match_ids = jnp.where(is_real, src, -1).astype(jnp.int32)
        return trail_slots, meta_slots, is_real | is_fp, is_fp, match_ids

    keys = jax.random.split(k_perm, b)
    trail_s, meta_s, active, fp_flag, match_ids = jax.vmap(fill_one)(
        keys, trails, meta_hist, targets.valid, n_targets
    )

    # 4. encode + pack. trail_enc_dim == 0 -> RAW trails (the reference's
    # use_encoding_tracklets=False default, models/__init__.py:83-90)
    if trail_enc_dim:
        trail_enc = sine_encode_trail(
            trail_s.reshape(b, t, l * 4), trail_enc_dim
        )  # [B, T, L*4*enc]
    else:
        trail_enc = trail_s.reshape(b, t, l * 4)
    embeds = jnp.concatenate(
        [trail_enc, meta_s.reshape(b, t, l * m)], axis=-1
    ).astype(jnp.float32)

    return targets.replace(
        track_query_embeds=embeds,
        track_query_boxes=trail_s[:, :, -1, :],
        track_query_mask=active,
        track_query_fp_mask=fp_flag,
        track_query_match_ids=match_ids,
    )


def kine_track_embed_dims(trail_len: int, trail_enc_dim: int, meta_dim: int):
    """(trail feature width, metadata history width) for the model's
    track_proj split. trail_enc_dim == 0 -> raw trails (4 per frame)."""
    per_frame = 4 * trail_enc_dim if trail_enc_dim else 4
    return trail_len * per_frame, trail_len * meta_dim
