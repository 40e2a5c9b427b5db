"""Fixed-shape batch containers (pytree dataclasses).

The reference's NestedTensor (util/misc.py:407-443) pads each batch to the
max image size in the batch — a fresh shape every step, which would force
one XLA compile per batch. Here images are padded to a *bucketed* static
shape on host, and every per-image annotation list is padded to a static
maximum with a validity mask, so the whole train step is one compiled graph.

Conventions:
- images are NHWC float32/bfloat16, ImageNet-normalized
- `pad_mask` is True at padded pixels (matches reference NestedTensor.mask)
- target slots with valid == False are padding; consumers must mask
"""
from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class ImageBatch:
    """Padded image batch ≙ NestedTensor (reference util/misc.py:407-443)."""

    images: jnp.ndarray  # [B, H, W, 3]
    pad_mask: jnp.ndarray  # [B, H, W] bool, True = padding

    @property
    def batch(self):
        return self.images.shape[0]


@flax.struct.dataclass
class Targets:
    """Per-image GT padded to static max_objects.

    `track_*` fields carry the track-query state injected by the tracking
    trainer / online tracker; all are padded to static max_track_queries
    (reference builds these dynamically: detr_tracking.py:164-184).
    """

    boxes: jnp.ndarray  # [B, N, 4] cxcywh, normalized to [0,1]
    labels: jnp.ndarray  # [B, N] int32
    valid: jnp.ndarray  # [B, N] bool
    track_ids: jnp.ndarray  # [B, N] int32 (-1 when absent)

    # track-query state (zeros/False when tracking is off)
    track_query_embeds: jnp.ndarray  # [B, T, D]
    track_query_boxes: jnp.ndarray  # [B, T, 4] cxcywh normalized
    track_query_mask: jnp.ndarray  # [B, T] bool — slot holds a track query
    track_query_fp_mask: jnp.ndarray  # [B, T] bool — false-positive slot
    track_query_match_ids: jnp.ndarray  # [B, T] int32 — GT slot index or -1

    masks: jnp.ndarray | None = None  # [B, N, Hm, Wm] segmentation GT

    @classmethod
    def create(
        cls,
        boxes,
        labels,
        valid,
        track_ids=None,
        num_track_queries: int = 0,
        hidden_dim: int = 256,
    ):
        b, n = labels.shape
        t = num_track_queries
        if track_ids is None:
            track_ids = jnp.full((b, n), -1, jnp.int32)
        return cls(
            boxes=jnp.asarray(boxes, jnp.float32),
            labels=jnp.asarray(labels, jnp.int32),
            valid=jnp.asarray(valid, bool),
            track_ids=jnp.asarray(track_ids, jnp.int32),
            track_query_embeds=jnp.zeros((b, t, hidden_dim), jnp.float32),
            track_query_boxes=jnp.zeros((b, t, 4), jnp.float32),
            track_query_mask=jnp.zeros((b, t), bool),
            track_query_fp_mask=jnp.zeros((b, t), bool),
            track_query_match_ids=jnp.full((b, t), -1, jnp.int32),
        )

    @property
    def num_track_slots(self):
        return self.track_query_mask.shape[1]


@flax.struct.dataclass
class KineBatch:
    """KineT input ≙ NestedTensorKinet (reference util/misc.py:445-459):
    per-frame external detections + scalar metadata, padded to max slots."""

    detections: jnp.ndarray  # [B, N, 4] boxes (cxcywh normalized or sine-encoded)
    metadata: jnp.ndarray  # [B, N, M] confidence (+class)
    pad_mask: jnp.ndarray  # [B, N] bool, True = padding


def pick_bucket(h: int, w: int, buckets) -> tuple[int, int]:
    """Smallest (short, long) bucket that fits an h×w image (host-side)."""
    short, long = min(h, w), max(h, w)
    for bs, bl in buckets:
        if short <= bs and long <= bl:
            return (bs, bl) if h <= w else (bl, bs)
    bs, bl = buckets[-1]
    return (bs, bl) if h <= w else (bl, bs)


def pad_image_to(img: np.ndarray, ph: int, pw: int):
    """Host-side zero-pad HWC image to (ph, pw); returns (padded, pad_mask)."""
    h, w, c = img.shape
    out = np.zeros((ph, pw, c), img.dtype)
    out[:h, :w] = img
    mask = np.ones((ph, pw), bool)
    mask[:h, :w] = False
    return out, mask
