"""Deformable DETR (reference: src/trackformer/models/deformable_detr.py).

Re-design notes (vs reference :124-275):
- NHWC multi-scale pyramid; per-level 1x1 input projections + GroupNorm(32)
  and an extra stride-64 level via 3x3/s2 conv (reference :60-79, 194-221),
- multi-frame attention: the CURRENT frame's levels come FIRST in the
  flattened sequence (the reference emits [prev, cur] then swaps halves
  after its separate encoders, deformable_transformer.py:160-175 — net
  layout identical),
- iterative box refinement with per-layer heads (reference :98-108),
  two-stage proposals (:109-113), merge_frame_features conv (:115-117,180),
- track queries occupy fixed leading decoder slots; their boxes provide
  4-d reference points (deformable_transformer.py:198-232).
- class head bias uses the focal prior init (prior_prob 0.01).
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..structs import ImageBatch, Targets
from .backbone import Backbone, downsample_pad_mask
from .deformable_transformer import DeformableTransformer, inverse_sigmoid
from .detr import MLP
from .position_encoding import sine3d_position_encoding, sine_position_encoding


class DeformableDETR(nn.Module):
    num_classes: int = 20
    hidden_dim: int = 288
    num_queries: int = 300
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 1024
    dropout: float = 0.1
    activation: str = "relu"
    pre_norm: bool = False  # unused (deformable layers are post-norm)
    aux_loss: bool = True
    backbone_name: str = "resnet50"
    dilation: bool = False
    num_feature_levels: int = 4
    dec_n_points: int = 4
    enc_n_points: int = 4
    with_box_refine: bool = False
    two_stage: bool = False
    multi_frame_attention: bool = False
    multi_frame_encoding: bool = True
    merge_frame_features: bool = False
    # TPU-first redesign: frame-slot-agnostic encoder so the tracker can
    # reuse last step's encoded memory as this step's prev-frame memory
    # (pass `prev_memory`), halving encoder work per frame. The reference
    # re-encodes both frames every step (deformable_transformer.py:160-173);
    # within its *separate per-frame* encoders the frame-slot label carries
    # no cross-frame information, so dropping it only removes a symmetry
    # label — frames stay distinguished in the decoder via per-level params.
    cache_prev_encoder: bool = False
    enc_msda_shared_locs: bool = False  # encoder MSDA: head-shared locations
    enc_msda_topk: int = 0  # encoder MSDA: DEFA-style top-k pruning
    enc_msda_int8: bool = False  # encoder MSDA: int8 values at inference
    enc_lite: bool = False  # Lite-DETR interleaved high-level update
    enc_lite_klevels: int = 0  # low-level update: sample k finest levels
    enc_lite_high_klevels: int = 0  # high-level updates: k finest levels
    dec_gather_raw: bool = False  # decoder cross-attn gather-then-project
    dec_klevels: int = 0  # decoder samples only the k finest levels/frame
    dec_msda_int8: bool = False  # int8 decoder quad tables (lossy, infer)
    msda_ref_normalizer: bool = False  # fork's (H, W) offset normalizer
    # (swapped vs upstream; needed for bit-faithful fork-checkpoint use)
    num_track_slots: int = 0
    focal_loss: bool = True
    masks: bool = False
    remat: bool = False

    def setup(self):
        gn_groups = math.gcd(32, self.hidden_dim)
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
                return_interm_layers=True,
                dilation=self.dilation,
            )
        backbone_channels = self.backbone.num_channels  # [512, 1024, 2048]
        n_backbone_levels = min(self.num_feature_levels, len(backbone_channels))

        projs = []
        for i in range(n_backbone_levels):
            projs.append(
                (
                    nn.Conv(self.hidden_dim, (1, 1), name=f"input_proj{i}"),
                    nn.GroupNorm(num_groups=gn_groups, epsilon=1e-5, name=f"input_proj_gn{i}"),
                )
            )
        for i in range(n_backbone_levels, self.num_feature_levels):
            projs.append(
                (
                    nn.Conv(
                        self.hidden_dim, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], name=f"input_proj{i}",
                    ),
                    nn.GroupNorm(num_groups=gn_groups, epsilon=1e-5, name=f"input_proj_gn{i}"),
                )
            )
        self.input_projs = projs
        if self.merge_frame_features:
            self.merge_convs = [
                nn.Conv(self.hidden_dim, (1, 1), name=f"merge{i}")
                for i in range(self.num_feature_levels)
            ]

        total_levels = self.num_feature_levels * (
            2 if self.multi_frame_attention else 1
        )
        self.transformer = DeformableTransformer(
            d_model=self.hidden_dim,
            nheads=self.nheads,
            num_encoder_layers=self.enc_layers,
            num_decoder_layers=self.dec_layers,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout,
            activation=self.activation,
            num_feature_levels=total_levels,
            dec_n_points=self.dec_n_points,
            enc_n_points=self.enc_n_points,
            two_stage=self.two_stage,
            two_stage_num_proposals=self.num_queries,
            multi_frame_attention_separate_encoder=self.multi_frame_attention,
            frame_agnostic_levels=self.cache_prev_encoder,
            enc_shared_locs=self.enc_msda_shared_locs,
            enc_topk=self.enc_msda_topk,
            enc_int8=self.enc_msda_int8,
            enc_lite=self.enc_lite,
            enc_lite_klevels=self.enc_lite_klevels,
            enc_lite_high_klevels=self.enc_lite_high_klevels,
            dec_gather_raw=self.dec_gather_raw,
            dec_klevels=self.dec_klevels,
            dec_int8_quad=self.dec_msda_int8,
            msda_ref_normalizer=self.msda_ref_normalizer,
            remat=self.remat,
        )
        if self.cache_prev_encoder:
            assert self.multi_frame_attention, (
                "cache_prev_encoder requires multi_frame_attention"
            )
            assert not self.merge_frame_features, (
                "cache_prev_encoder is incompatible with merge_frame_features"
            )
        if not self.two_stage:
            self.query_embed = self.param(
                "query_embed",
                nn.initializers.normal(1.0),
                (self.num_queries, self.hidden_dim * 2),
            )

        out_classes = self.num_classes + (0 if self.focal_loss else 1)
        prior = 0.01
        bias_init = nn.initializers.constant(
            -math.log((1 - prior) / prior) if self.focal_loss else 0.0
        )
        n_heads = self.dec_layers + (1 if self.two_stage else 0)
        if self.with_box_refine or self.two_stage:
            self.class_embeds = [
                nn.Dense(out_classes, bias_init=bias_init, name=f"class_embed{i}")
                for i in range(n_heads)
            ]
            self.bbox_embeds = [
                MLP(self.hidden_dim, 4, 3, name=f"bbox_embed{i}")
                for i in range(n_heads)
            ]
        else:
            shared_c = nn.Dense(out_classes, bias_init=bias_init, name="class_embed")
            shared_b = MLP(self.hidden_dim, 4, 3, name="bbox_embed")
            self.class_embeds = [shared_c] * n_heads
            self.bbox_embeds = [shared_b] * n_heads

    def _project_levels(self, feats, pad_mask, merge_with=None):
        """Input projections + extra stride-64 level (reference :165-221)."""
        srcs, masks = [], []
        for i in range(self.num_feature_levels):
            conv, gn = self.input_projs[i]
            if i < len(feats):
                src = gn(conv(feats[i]))
            elif i == len(feats):
                src = gn(conv(feats[-1]))
            else:
                src = gn(conv(srcs[-1]))
            if self.merge_frame_features and merge_with is not None:
                src = self.merge_convs[i](
                    jnp.concatenate([src, merge_with[i]], axis=-1)
                )
            srcs.append(src)
            masks.append(
                downsample_pad_mask(pad_mask, (src.shape[1], src.shape[2]))
            )
        return srcs, masks

    def _pos_embeds(self, masks, frame_idx: int):
        pos = []
        for m in masks:
            if self.multi_frame_attention and self.multi_frame_encoding:
                p3 = sine3d_position_encoding(
                    m, self.hidden_dim // 3, num_frames=2, pad_to=self.hidden_dim
                )
                pos.append(p3[:, frame_idx])
            else:
                pos.append(sine_position_encoding(m, self.hidden_dim // 2))
        return pos

    def __call__(
        self,
        batch: ImageBatch,
        targets: Optional[Targets] = None,
        prev_features=None,  # (feats list, pad_mask) of the previous frame
        prev_memory=None,  # (encoded memory [B,S_half,C], pad_mask) of the
        # previous frame — skips its backbone/input-proj/encoder entirely
        # (requires cache_prev_encoder; produced as out["frame_memory"])
        pos_cache=None,  # per-level sine position embeddings from a prior
        # step (out["pos_cache"]): pure functions of the pad mask, which is
        # fixed across a tracking sequence — skips ~1 ms/frame of sin/cos
        deterministic: bool = True,
    ):
        feats_all, _ = self.backbone(batch.images, batch.pad_mask)
        # pyramid uses C3..C5 (reference deformable_detr.py:144: features[-3:])
        feats = feats_all[-3:]
        b = batch.images.shape[0]

        if self.merge_frame_features:
            prev_feats = feats if prev_features is None else prev_features[0]
            prev_projected = []
            for i in range(self.num_feature_levels):
                conv, gn = self.input_projs[i]
                if i < len(prev_feats):
                    prev_projected.append(gn(conv(prev_feats[i])))
                elif i == len(prev_feats):
                    prev_projected.append(gn(conv(prev_feats[-1])))
                else:
                    prev_projected.append(gn(conv(prev_projected[-1])))
        else:
            prev_projected = None

        srcs, masks = self._project_levels(
            feats, batch.pad_mask, merge_with=prev_projected
        )
        if pos_cache is not None:
            pos = list(pos_cache)
        else:
            pos = self._pos_embeds(masks, frame_idx=0)

        tf_kwargs = {}
        if self.multi_frame_attention:
            if self.cache_prev_encoder and prev_memory is not None:
                # (memory, pad_mask) or (memory, pad_mask, decoder quad)
                mem_prev, prev_pad = prev_memory[0], prev_memory[1]
                prev_quad = prev_memory[2] if len(prev_memory) > 2 else None
                p_masks = [
                    downsample_pad_mask(prev_pad, (m.shape[1], m.shape[2]))
                    for m in masks
                ]
                tf_kwargs = dict(
                    prev_encoded=mem_prev, prev_masks=p_masks,
                    prev_quad=prev_quad,
                )
            elif self.cache_prev_encoder and prev_features is None:
                # first frame: prev := current; with the frame-agnostic
                # encoder its memory is exactly mem_cur — one encoder run
                tf_kwargs = dict(prev_is_current=True)
            else:
                if prev_features is None:
                    prev_feats, prev_pad = feats, batch.pad_mask
                else:
                    prev_feats, prev_pad = prev_features
                p_srcs, p_masks = self._project_levels(
                    prev_feats, prev_pad, merge_with=prev_projected
                )
                p_pos = self._pos_embeds(
                    p_masks, frame_idx=0 if self.cache_prev_encoder else 1
                )
                srcs = srcs + p_srcs
                masks = masks + p_masks
                pos = pos + p_pos

        t = self.num_track_slots
        if t > 0:
            if targets is None:
                active = jnp.zeros((b, t), bool)
                tq_embeds = jnp.zeros((b, t, self.hidden_dim), jnp.float32)
                tq_boxes = jnp.full((b, t, 4), 0.5, jnp.float32)
            else:
                active = targets.track_query_mask
                tq_embeds = targets.track_query_embeds
                tq_boxes = jnp.where(
                    active[..., None], targets.track_query_boxes, 0.5
                )
        else:
            active = None
            tq_embeds = None
            tq_boxes = None

        (hs, memory, init_ref, inter_refs, enc_cls, enc_coord, q_pad,
         quad_cur) = (
            self.transformer(
                srcs,
                masks,
                pos,
                query_embed=None if self.two_stage else self.query_embed,
                track_query_embeds=tq_embeds,
                track_query_boxes=tq_boxes,
                track_query_active=active,
                class_embed_fn=self.class_embeds[-1] if self.two_stage else None,
                bbox_embed_fn=self.bbox_embeds[-1] if self.two_stage else None,
                bbox_embed_fns=(
                    self.bbox_embeds[: self.dec_layers]
                    if self.with_box_refine
                    else None
                ),
                deterministic=deterministic,
                **tf_kwargs,
            )
        )

        logits_layers, box_layers = [], []
        for lvl in range(self.dec_layers):
            ref = init_ref if lvl == 0 else inter_refs[lvl - 1]
            ref = inverse_sigmoid(ref)
            logits_layers.append(self.class_embeds[lvl](hs[lvl]))
            tmp = self.bbox_embeds[lvl](hs[lvl])
            if ref.shape[-1] == 4:
                tmp = tmp + ref
            else:
                tmp = jnp.concatenate([tmp[..., :2] + ref, tmp[..., 2:]], -1)
            box_layers.append(jax.nn.sigmoid(tmp))

        nq = hs.shape[2]
        query_valid = (
            ~q_pad if q_pad is not None else jnp.ones((b, nq), bool)
        )
        out = {
            "pred_logits": logits_layers[-1],
            "pred_boxes": box_layers[-1],
            "hs_embed": hs[-1],
            "query_valid": query_valid,
        }
        if self.aux_loss:
            out["aux_outputs"] = [
                {"pred_logits": logits_layers[i], "pred_boxes": box_layers[i]}
                for i in range(self.dec_layers - 1)
            ]
        if self.two_stage:
            out["enc_outputs"] = {
                "pred_logits": enc_cls,
                "pred_boxes": jax.nn.sigmoid(enc_coord),
            }
        # features of this frame, reusable as next frame's prev_features
        out["frame_features"] = (feats, batch.pad_mask)
        if self.multi_frame_attention and self.cache_prev_encoder:
            # this frame's encoded memory, reusable as next frame's
            # prev_memory (frame-agnostic encoder makes it exact)
            split = sum(
                m.shape[1] * m.shape[2]
                for m in masks[: self.num_feature_levels]
            )
            out["frame_memory"] = (
                (memory[:, :split], batch.pad_mask)
                if quad_cur is None
                else (memory[:, :split], batch.pad_mask, quad_cur)
            )
            # current-frame per-level sine pos embeddings, reusable as the
            # next frame's pos_cache while the pad mask is unchanged (it is
            # across a tracking sequence)
            out["pos_cache"] = tuple(pos[: self.num_feature_levels])
        out["backbone_features"] = feats_all  # all levels (mask-head FPN)
        out["memory"] = memory
        return out
