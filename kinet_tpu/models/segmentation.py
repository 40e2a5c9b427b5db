"""Segmentation heads (reference: src/trackformer/models/detr_segmentation.py).

- MHAttentionMap: per-query multi-head 2D attention over the memory map
  (reference :181-216) -> [B, Q, heads, H, W] softmaxed over pixels,
- MaskHeadSmallConv: FPN-style conv decoder over [proj feats | attn maps]
  with skips from C4/C3/C2 (reference :105-178), NHWC convs + GroupNorm(8),
- postprocess_segm: resize mask logits to original size, sigmoid+threshold
  (reference PostProcessSegm :219-253),
- SegmWrapper: composes any detector model with the mask head — the flax
  equivalent of the DETRSegm/DeformableDETRSegm(+Tracking) mixin grid
  (reference :75-98).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..structs import ImageBatch, Targets


class MHAttentionMap(nn.Module):
    """Query-to-image attention logits (reference :181-216)."""

    hidden_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, q, memory, pad_mask=None):
        # q: [B, Q, D]; memory: [B, H, W, D]
        b, nq, _ = q.shape
        h, w = memory.shape[1], memory.shape[2]
        d_head = self.hidden_dim // self.num_heads
        qh = nn.Dense(self.hidden_dim, name="q_linear")(q)
        kh = nn.Dense(self.hidden_dim, name="k_linear")(memory)
        qh = qh.reshape(b, nq, self.num_heads, d_head)
        kh = kh.reshape(b, h * w, self.num_heads, d_head)
        logits = jnp.einsum("bqnd,bpnd->bqnp", qh, kh) / (d_head**0.5)
        if pad_mask is not None:
            logits = jnp.where(
                pad_mask.reshape(b, 1, 1, h * w), -1e9, logits
            )
        # reference :214: softmax over heads AND positions JOINTLY
        # (weights.flatten(2)) — not per-head
        attn = jax.nn.softmax(
            logits.reshape(b, nq, self.num_heads * h * w), axis=-1
        )
        return attn.reshape(b, nq, self.num_heads, h, w)


def _gn(x, name):
    import math

    groups = math.gcd(8, x.shape[-1])
    return nn.GroupNorm(num_groups=groups, epsilon=1e-5, name=name)(x)


class MaskHeadSmallConv(nn.Module):
    """FPN-style mask decoder (reference :105-178). Operates per query by
    folding Q into the batch axis; NHWC."""

    dim: int  # hidden + nheads
    context_dim: int

    @nn.compact
    def __call__(self, x, bbox_mask, fpns):
        # x: [B, H, W, D]; bbox_mask: [B, Q, heads, H, W]; fpns: C4, C3, C2
        b, nq = bbox_mask.shape[:2]
        heads = bbox_mask.shape[2]
        x = jnp.repeat(x[:, None], nq, axis=1)  # [B, Q, H, W, D]
        attn = bbox_mask.transpose(0, 1, 3, 4, 2)  # [B, Q, H, W, heads]
        x = jnp.concatenate([x, attn], axis=-1)
        x = x.reshape(b * nq, *x.shape[2:])

        inter = [
            self.dim, self.context_dim // 2, self.context_dim // 4,
            self.context_dim // 8, self.context_dim // 16,
        ]
        x = nn.relu(_gn(nn.Conv(inter[0], (3, 3), name="lay1")(x), "gn1"))
        x = nn.relu(_gn(nn.Conv(inter[1], (3, 3), name="lay2")(x), "gn2"))

        for i, (fpn, width, lay) in enumerate(
            zip(fpns, inter[2:5], ("lay3", "lay4", "lay5"))
        ):
            adapted = nn.Conv(
                x.shape[-1], (1, 1), name=f"adapter{i + 1}"
            )(fpn)  # [B, Hf, Wf, C]
            adapted = jnp.repeat(adapted, nq, axis=0)  # match B*Q
            up = jax.image.resize(
                x,
                (x.shape[0], adapted.shape[1], adapted.shape[2], x.shape[-1]),
                method="nearest",
            )
            x = adapted + up
            x = nn.relu(_gn(nn.Conv(width, (3, 3), name=lay)(x), f"gn{i + 3}"))

        x = nn.Conv(1, (3, 3), name="out_lay")(x)
        return x[..., 0].reshape(b, nq, x.shape[1], x.shape[2])


class SegmWrapper(nn.Module):
    """Detector + mask head (≙ reference DETRSegm* mixins :29-98).

    The wrapped `detector` must return `memory` [B, H, W, D] (vanilla DETR)
    or the flattened multi-scale memory plus frame features (deformable);
    for deformable, the stride-8 slice of the memory is used like reference
    :44-54.
    """

    detector: nn.Module
    hidden_dim: int
    nheads: int
    fpn_channels: tuple = (1024, 512, 256)

    @nn.compact
    def __call__(
        self,
        batch: ImageBatch,
        targets: Optional[Targets] = None,
        deterministic: bool = True,
        **kw,
    ):
        out = self.detector(batch, targets, deterministic=deterministic, **kw)
        feats = out.get("backbone_features")
        if feats is None:
            feats = out["frame_features"][0]
        if len(feats) >= 4:
            fpns = [feats[-2], feats[-3], feats[-4]]
        else:
            fpns = [feats[-1], feats[-2], feats[-3]] if len(feats) == 3 else feats

        memory = out["memory"]
        if memory.ndim == 3:
            # deformable flattened memory: take the stride-8 level, whose
            # spatial shape is the first entry of the *pyramid* (C3), not of
            # the full backbone feature list (reference :44-54)
            pyramid = out["frame_features"][0]
            h8, w8 = pyramid[0].shape[1], pyramid[0].shape[2]
            memory = memory[:, : h8 * w8].reshape(
                memory.shape[0], h8, w8, -1
            )
            pad = None
        else:
            pad = out.get("memory_pad_mask")
            pad = pad.reshape(pad.shape[0], -1) if pad is not None else None

        # reference detr_segmentation.py:62: attention over the encoder
        # memory queried by the NORMED last-layer hs (hs[-1], not the
        # pre-norm hs_embed feedback)
        hs_q = out.get("hs_last", out["hs_embed"])
        bbox_mask = MHAttentionMap(
            self.hidden_dim, self.nheads, name="bbox_attention"
        )(hs_q, memory, pad)
        # reference detr_segmentation.py:55-60: the mask head's src is the
        # PROJECTED top backbone feature (input_proj(features[-1])), not
        # the encoder memory
        src = out.get("src_proj", memory)
        seg = MaskHeadSmallConv(
            self.hidden_dim + self.nheads, self.hidden_dim, name="mask_head"
        )(src, bbox_mask, fpns)
        out["pred_masks"] = seg
        return out


def postprocess_segm(results, outputs, orig_size, threshold=0.5):
    """Resize mask logits to orig size; sigmoid > 0.5 (reference :219-253).
    orig_size: (h, w) static python ints for one sequence."""
    masks = outputs["pred_masks"]  # [B, Q, Hm, Wm]
    b, q = masks.shape[:2]
    h, w = int(orig_size[0]), int(orig_size[1])
    probs = jax.nn.sigmoid(masks)
    probs = jax.image.resize(probs, (b, q, h, w), method="bilinear")
    results = dict(results)
    results["masks_probs"] = probs
    results["masks"] = probs > threshold
    return results
