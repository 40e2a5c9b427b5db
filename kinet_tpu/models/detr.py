"""DETR and the KineT model family (reference: src/trackformer/models/detr.py).

TPU-first re-design of the reference's DETR (detr.py:17-149):
- query sequence is a STATIC [T track slots | Q object queries] layout.
  The reference concatenates a per-batch variable number of track queries
  (detr.py:99-117) — a new shape (and a recompile) every step. Here inactive
  track slots are masked out of self-attention and excluded from losses via
  `query_valid`.
- layout is NHWC / [B, L, D]; the memory flattening that the reference's
  transformer does internally happens here once.
- outputs follow the reference dict contract: pred_logits, pred_boxes,
  hs_embed (input for next-frame track queries), aux_outputs.

KineT family (reference detr.py:152-564):
- KineT: detections -> KinematicTransformer (reference :152-285)
- KinematicDetectorTransformer: dual backbone + DualKinematicTransformer
  (reference :288-425)
- KinematicDetectorEncoder: encoder-only, trails concatenated into the
  source sequence (reference :427-564)
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..structs import ImageBatch, KineBatch, Targets
from .backbone import Backbone, KinetBackbone
from .position_encoding import (
    sine_detection_encoding,
    sine_position_encoding,
)
from .transformer import (
    DualKinematicEncoder,
    DualKinematicTransformer,
    Transformer,
)


class MLP(nn.Module):
    """Simple multi-layer perceptron head (reference detr.py:937-951)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 3

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, name=f"layer{i}")(x))
        return nn.Dense(self.output_dim, name=f"layer{self.num_layers - 1}")(x)


class DETR(nn.Module):
    """Vanilla DETR with fixed track-query slots.

    Call with an ImageBatch and (optionally) Targets carrying track-query
    state; returns the output dict. `num_track_slots` > 0 reserves the
    leading decoder slots for track queries.
    """

    num_classes: int = 20
    hidden_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    pre_norm: bool = False
    aux_loss: bool = True
    backbone_name: str = "resnet50"
    dilation: bool = False
    num_track_slots: int = 0
    track_attention: bool = False
    focal_loss: bool = False
    masks: bool = False
    generate_attention_maps: bool = False  # sow decoder cross-attn weights
    # (≙ reference tracker.py:39-62 forward hooks; vanilla DETR only)

    def setup(self):
        # with masks, all 4 pyramid levels are exposed for the FPN mask head
        # (reference backbone.py:72-81: return_interm_layers when masks)
        if self.masks:
            from .backbone import BackboneWithMasksAll

            self.backbone = BackboneWithMasksAll(
                name_arch=self.backbone_name,
                return_interm_layers=True,
                dilation=self.dilation,
            )
        else:
            self.backbone = Backbone(
                name_arch=self.backbone_name,
                return_interm_layers=False,
                dilation=self.dilation,
            )
        self.input_proj = nn.Conv(self.hidden_dim, (1, 1), name="input_proj")
        self.query_embed = self.param(
            "query_embed",
            nn.initializers.normal(1.0),
            (self.num_queries, self.hidden_dim),
        )
        self.transformer = Transformer(
            d_model=self.hidden_dim,
            nheads=self.nheads,
            num_encoder_layers=self.enc_layers,
            num_decoder_layers=self.dec_layers,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout,
            activation=self.activation,
            pre_norm=self.pre_norm,
            track_attention=self.track_attention,
            num_track_slots=self.num_track_slots,
            sow_attention=self.generate_attention_maps,
        )
        # +1 background class for softmax CE; focal uses sigmoid w/o eos col
        out_classes = self.num_classes + (0 if self.focal_loss else 1)
        self.class_embed = nn.Dense(out_classes, name="class_embed")
        self.bbox_embed = MLP(self.hidden_dim, 4, 3, name="bbox_embed")

    def __call__(
        self,
        batch: ImageBatch,
        targets: Optional[Targets] = None,
        prev_features=None,  # accepted for API parity; vanilla DETR is
        deterministic: bool = True,  # single-frame (reference detr.py:66)
    ):
        feats, masks = self.backbone(batch.images, batch.pad_mask)
        src, pad = feats[-1], masks[-1]
        src = self.input_proj(src)
        b, h, w, d = src.shape

        pos = sine_position_encoding(pad, self.hidden_dim // 2)
        src_flat = src.reshape(b, h * w, d)
        pos_flat = pos.reshape(b, h * w, d).astype(src.dtype)
        pad_flat = pad.reshape(b, h * w)

        t = self.num_track_slots
        obj_query_pos = jnp.broadcast_to(
            self.query_embed[None], (b, self.num_queries, d)
        ).astype(src.dtype)
        if t > 0:
            # track queries: hs_embed as decoder input, zero query_pos
            # (reference detr.py:99-117); targets=None (e.g. the prev-frame
            # forward) means all slots inactive
            if targets is None:
                active = jnp.zeros((b, t), bool)
                tq = jnp.zeros((b, t, d), src.dtype)
            else:
                active = targets.track_query_mask
                tq = jnp.where(
                    active[..., None], targets.track_query_embeds, 0.0
                ).astype(src.dtype)
            query_pos = jnp.concatenate(
                [jnp.zeros((b, t, d), src.dtype), obj_query_pos], axis=1
            )
            tgt = jnp.concatenate(
                [tq, jnp.zeros((b, self.num_queries, d), src.dtype)], axis=1
            )
            tgt_pad = jnp.concatenate(
                [~active, jnp.zeros((b, self.num_queries), bool)], axis=1
            )
        else:
            query_pos = obj_query_pos
            tgt = jnp.zeros_like(query_pos)
            tgt_pad = jnp.zeros((b, self.num_queries), bool)

        hs, hs_raw, memory = self.transformer(
            src_flat,
            pos_flat,
            query_pos,
            tgt=tgt,
            src_key_pad_mask=pad_flat,
            tgt_key_pad_mask=tgt_pad,
            deterministic=deterministic,
        )  # hs: [L, B, T+Q, D]

        logits = self.class_embed(hs)
        boxes = jax.nn.sigmoid(self.bbox_embed(hs))

        out = {
            "pred_logits": logits[-1],
            "pred_boxes": boxes[-1],
            # track-query feedback is the PRE-norm decoder output
            # (reference detr.py:135: hs_without_norm[-1])
            "hs_embed": hs_raw[-1],
            # NORMED last hs — what the mask head's attention consumes
            # (reference detr_segmentation.py:62 uses hs[-1])
            "hs_last": hs[-1],
            # projected top backbone feature — the mask head's src input
            # (reference detr_segmentation.py:55-60: input_proj(features[-1]),
            # NOT the encoder memory)
            "src_proj": src,
            "query_valid": ~tgt_pad,
            "memory": memory.reshape(b, h, w, d),
            "memory_pad_mask": pad,
            "frame_features": (feats, batch.pad_mask),
        }
        if self.aux_loss:
            out["aux_outputs"] = [
                {"pred_logits": logits[i], "pred_boxes": boxes[i]}
                for i in range(hs.shape[0] - 1)
            ]
        return out


class KineT(nn.Module):
    """Image-free tracking transformer over external detections
    (reference detr.py:152-285): detection vectors -> MLP backbone ->
    KinematicTransformer; track queries are sine-encoded trail embeddings.
    """

    num_classes: int = 20
    hidden_dim: int = 288
    num_queries: int = 150
    nheads: int = 8
    enc_layers: int = 1
    dec_layers: int = 1
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    pre_norm: bool = False
    aux_loss: bool = True
    num_track_slots: int = 0
    max_detections: int = 60
    focal_loss: bool = False

    def setup(self):
        self.det_backbone = KinetBackbone(
            self.hidden_dim, self.dropout, self.activation
        )
        self.query_embed = self.param(
            "query_embed",
            nn.initializers.normal(1.0),
            (self.num_queries, self.hidden_dim),
        )
        self.transformer = Transformer(
            d_model=self.hidden_dim,
            nheads=self.nheads,
            num_encoder_layers=self.enc_layers,
            num_decoder_layers=self.dec_layers,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout,
            activation=self.activation,
            pre_norm=self.pre_norm,
        )
        out_classes = self.num_classes + (0 if self.focal_loss else 1)
        self.class_embed = nn.Dense(out_classes, name="class_embed")
        self.bbox_embed = MLP(self.hidden_dim, 4, 3, name="bbox_embed")

    def __call__(
        self,
        batch: KineBatch,
        targets: Optional[Targets] = None,
        deterministic: bool = True,
    ):
        det_emb, meta_emb = self.det_backbone(batch.detections, batch.metadata)
        src = det_emb + meta_emb
        b, n, d = src.shape
        pos = sine_detection_encoding(
            batch.pad_mask, d // 2, max_detections=self.max_detections
        ).astype(src.dtype)

        t = self.num_track_slots
        obj_query_pos = jnp.broadcast_to(
            self.query_embed[None], (b, self.num_queries, d)
        ).astype(src.dtype)
        if t > 0:
            if targets is None:
                active = jnp.zeros((b, t), bool)
                tq = jnp.zeros((b, t, d), src.dtype)
            else:
                active = targets.track_query_mask
                tq = jnp.where(
                    active[..., None], targets.track_query_embeds, 0.0
                ).astype(src.dtype)
            query_pos = jnp.concatenate(
                [jnp.zeros((b, t, d), src.dtype), obj_query_pos], axis=1
            )
            tgt = jnp.concatenate(
                [tq, jnp.zeros((b, self.num_queries, d), src.dtype)], axis=1
            )
            tgt_pad = jnp.concatenate(
                [~active, jnp.zeros((b, self.num_queries), bool)], axis=1
            )
        else:
            query_pos = obj_query_pos
            tgt = jnp.zeros_like(query_pos)
            tgt_pad = jnp.zeros((b, self.num_queries), bool)

        hs, hs_raw, memory = self.transformer(
            src,
            pos,
            query_pos,
            tgt=tgt,
            src_key_pad_mask=batch.pad_mask,
            tgt_key_pad_mask=tgt_pad,
            deterministic=deterministic,
        )
        logits = self.class_embed(hs)
        boxes = jax.nn.sigmoid(self.bbox_embed(hs))
        out = {
            "pred_logits": logits[-1],
            "pred_boxes": boxes[-1],
            # pre-norm feedback embedding (reference detr.py:271)
            "hs_embed": hs_raw[-1],
            "query_valid": ~tgt_pad,
        }
        if self.aux_loss:
            out["aux_outputs"] = [
                {"pred_logits": logits[i], "pred_boxes": boxes[i]}
                for i in range(hs.shape[0] - 1)
            ]
        return out


class KinematicDetectorTransformer(nn.Module):
    """Dual-stream KineT (reference detr.py:288-425): box stream + metadata
    stream through KinetBackbone, fused by DualKinematicTransformer.

    Track queries arrive as raw trail encodings per slot:
    track_query_embeds[..., :trail_enc_dim] = sine-encoded position trail,
    [..., trail_enc_dim:] = metadata history — the layout the kine
    augmentation / TrackerKinematic produce (reference keeps separate
    `track_query_hs_embeds_det/meta`, detr_tracking.py:791-805). Two Dense
    projections lift them to the model width per stream.
    """

    trail_enc_dim: int = 0  # 0 -> embeds are already [det|meta] at 2*hidden
    meta_hist_dim: int = 0  # metadata-history width when trail_enc_dim > 0

    num_classes: int = 20
    hidden_dim: int = 288
    num_queries: int = 150
    nheads: int = 8
    enc_layers: int = 1
    dec_layers: int = 1
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    pre_norm: bool = False
    aux_loss: bool = True
    num_track_slots: int = 0
    max_detections: int = 60
    focal_loss: bool = False

    def setup(self):
        self.kinet_backbone = KinetBackbone(
            self.hidden_dim, self.dropout, self.activation
        )
        self.query_embed_det = self.param(
            "query_embed_det",
            nn.initializers.normal(1.0),
            (self.num_queries, self.hidden_dim),
        )
        self.query_embed_meta = self.param(
            "query_embed_meta",
            nn.initializers.normal(1.0),
            (self.num_queries, self.hidden_dim),
        )
        self.transformer = DualKinematicTransformer(
            d_model=self.hidden_dim,
            nheads=self.nheads,
            num_encoder_layers=self.enc_layers,
            num_decoder_layers=self.dec_layers,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout,
            activation=self.activation,
            pre_norm=self.pre_norm,
        )
        out_classes = self.num_classes + (0 if self.focal_loss else 1)
        self.class_embed = nn.Dense(out_classes, name="class_embed")
        self.bbox_embed = MLP(self.hidden_dim, 4, 3, name="bbox_embed")
        if self.trail_enc_dim:
            # reference input_proj_tracklets_det / _metadata
            # (detr.py:314-316): 3-layer MLPs, the metadata one through a
            # hidden_dim//2 bottleneck
            self.track_proj_det = MLP(
                self.hidden_dim, self.hidden_dim, 3, name="track_proj_det"
            )
            self.track_proj_meta = MLP(
                self.hidden_dim // 2, self.hidden_dim, 3,
                name="track_proj_meta",
            )

    def __call__(
        self,
        batch: KineBatch,
        targets: Optional[Targets] = None,
        deterministic: bool = True,
    ):
        det_emb, meta_emb = self.kinet_backbone(
            batch.detections, batch.metadata, deterministic
        )
        b, n, d = det_emb.shape
        pos = sine_detection_encoding(
            batch.pad_mask, d // 2, max_detections=self.max_detections
        ).astype(det_emb.dtype)

        t = self.num_track_slots
        qp_det = jnp.broadcast_to(
            self.query_embed_det[None], (b, self.num_queries, d)
        ).astype(det_emb.dtype)
        qp_meta = jnp.broadcast_to(
            self.query_embed_meta[None], (b, self.num_queries, d)
        ).astype(det_emb.dtype)
        if t > 0:
            split = self.trail_enc_dim if self.trail_enc_dim else d
            meta_w = self.meta_hist_dim if self.trail_enc_dim else d
            if targets is None:
                active = jnp.zeros((b, t), bool)
                emb = jnp.zeros((b, t, split + meta_w), det_emb.dtype)
            else:
                active = targets.track_query_mask
                emb = targets.track_query_embeds
            raw_det = emb[..., :split]
            raw_meta = emb[..., split:]
            if self.trail_enc_dim:
                tq_det = self.track_proj_det(raw_det)
                tq_meta = self.track_proj_meta(raw_meta)
            else:
                tq_det, tq_meta = raw_det, raw_meta
            tq_det = jnp.where(active[..., None], tq_det, 0.0)
            tq_meta = jnp.where(active[..., None], tq_meta, 0.0)
            zeros_t = jnp.zeros((b, t, d), det_emb.dtype)
            qp_det = jnp.concatenate([zeros_t, qp_det], axis=1)
            qp_meta = jnp.concatenate([zeros_t, qp_meta], axis=1)
            tgt_det = jnp.concatenate(
                [tq_det.astype(det_emb.dtype), jnp.zeros((b, self.num_queries, d), det_emb.dtype)],
                axis=1,
            )
            tgt_meta = jnp.concatenate(
                [tq_meta.astype(det_emb.dtype), jnp.zeros((b, self.num_queries, d), det_emb.dtype)],
                axis=1,
            )
            tgt_pad = jnp.concatenate(
                [~active, jnp.zeros((b, self.num_queries), bool)], axis=1
            )
        else:
            tgt_det = jnp.zeros_like(qp_det)
            tgt_meta = jnp.zeros_like(qp_meta)
            tgt_pad = jnp.zeros((b, self.num_queries), bool)

        hs_det, hs_meta, _, _ = self.transformer(
            det_emb,
            meta_emb,
            pos,
            qp_det,
            qp_meta,
            tgt_det=tgt_det,
            tgt_meta=tgt_meta,
            src_key_pad_mask=batch.pad_mask,
            tgt_key_pad_mask=tgt_pad,
            deterministic=deterministic,
        )
        # reference detr.py:408-409: class head reads the METADATA stream,
        # box head the DETECTION stream
        logits = self.class_embed(hs_meta)
        boxes = jax.nn.sigmoid(self.bbox_embed(hs_det))
        out = {
            "pred_logits": logits[-1],
            "pred_boxes": boxes[-1],
            "hs_embed": jnp.concatenate([hs_det[-1], hs_meta[-1]], axis=-1),
            "query_valid": ~tgt_pad,
            # input detections pass through for the ordered-transformer
            # matcher (reference OrderDetectionsMatcherTransformer2 consumes
            # them from the batch, matcher.py:205-537)
            "detections": batch.detections,
            "det_valid": ~batch.pad_mask,
        }
        if self.aux_loss:
            out["aux_outputs"] = [
                {"pred_logits": logits[i], "pred_boxes": boxes[i]}
                for i in range(logits.shape[0] - 1)
            ]
        return out


class KinematicDetectorEncoder(nn.Module):
    """Encoder-only KineT (reference detr.py:427-564): sine-encoded track
    trails are *concatenated into the source sequence*; predictions are the
    encoder outputs at the trail rows (ordered-query matching).

    Sequence layout: [T trail slots | N detection slots]; outputs are read
    from the first T rows.
    """

    num_classes: int = 20
    hidden_dim: int = 288
    nheads: int = 8
    enc_layers: int = 1
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    pre_norm: bool = False
    num_track_slots: int = 60
    max_detections: int = 60
    focal_loss: bool = False

    def setup(self):
        self.kinet_backbone = KinetBackbone(
            self.hidden_dim, self.dropout, self.activation
        )
        self.trail_proj = nn.Dense(self.hidden_dim, name="trail_proj")
        self.encoder = DualKinematicEncoder(
            d_model=self.hidden_dim,
            nheads=self.nheads,
            num_encoder_layers=self.enc_layers,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout,
            activation=self.activation,
            pre_norm=self.pre_norm,
        )
        out_classes = self.num_classes + (0 if self.focal_loss else 1)
        self.class_embed = nn.Dense(out_classes, name="class_embed")
        self.bbox_embed = MLP(self.hidden_dim, 4, 3, name="bbox_embed")

    def __call__(
        self,
        batch: KineBatch,
        targets: Optional[Targets] = None,
        deterministic: bool = True,
    ):
        det_emb, meta_emb = self.kinet_backbone(
            batch.detections, batch.metadata, deterministic
        )
        b, n, d = det_emb.shape
        t = self.num_track_slots

        if targets is not None:
            active = targets.track_query_mask
            trails = jnp.where(
                active[..., None], targets.track_query_embeds, 0.0
            )
            trail_emb = self.trail_proj(trails).astype(det_emb.dtype)
        else:
            active = jnp.zeros((b, t), bool)
            trail_emb = jnp.zeros((b, t, d), det_emb.dtype)

        src_det = jnp.concatenate([trail_emb, det_emb], axis=1)
        src_meta = jnp.concatenate([trail_emb, meta_emb], axis=1)
        pad = jnp.concatenate([~active, batch.pad_mask], axis=1)
        pos = sine_detection_encoding(
            pad, d // 2, max_detections=self.max_detections
        ).astype(det_emb.dtype)

        enc_det, enc_meta = self.encoder(
            src_det, src_meta, pos, src_key_pad_mask=pad,
            deterministic=deterministic,
        )
        # all rows are predictions: [T trail slots | N detection slots] —
        # training supervises trail rows (ordered matcher), inference reads
        # new objects off the detection rows (reference detr.py:471-556)
        hs = enc_det + enc_meta
        logits = self.class_embed(hs)
        boxes = jax.nn.sigmoid(self.bbox_embed(hs))
        return {
            "pred_logits": logits,
            "pred_boxes": boxes,
            "hs_embed": hs,
            "query_valid": ~pad,
            # input detections pass through for the ordered-encoder
            # matcher's detection-slot fallback (reference
            # OrderDetectionsMatcherEncoder, matcher.py:666-676)
            "detections": batch.detections,
            "det_valid": ~batch.pad_mask,
        }
