"""Deformable transformer (reference: src/trackformer/models/deformable_transformer.py).

TPU-first notes:
- all level shapes are static python tuples, so the flatten/split layout is
  known at trace time (the reference carries them as device tensors),
- MSDeformAttn's sampling core is `kinet_tpu.ops.msda.ms_deform_attn`
  (XLA gather; Pallas kernel swaps in via `use_pallas`),
- track queries occupy fixed leading decoder slots with a key-pad mask
  (the reference concatenates variable-length lists, :200-232),
- the fork normalizes sampling offsets by (H, W) — swapped vs upstream
  Deformable-DETR (deformable_transformer.py + ms_deform_attn.py:77-80);
  we implement the correct (W, H) normalizer (evident intent, SURVEY §8).

Covers: MSDeformAttn module with grid-prior offset init (reference
ops/modules/ms_deform_attn.py:34-47), encoder with per-level reference
grids (:302-330), separate per-frame encoders (:160-173), decoder with
box refinement (:399-434), two-stage proposal generation (:92-122).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.msda import (
    ms_deform_attn_patch_shared,
    ms_deform_attn_quad_unroll as ms_deform_attn,
    ms_deform_attn_raw_pool,
    ms_deform_attn_topk_quad,
)


def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


def _offset_grid_init(n_heads, n_levels, n_points):
    """Directional prior for sampling offsets (reference
    ms_deform_attn.py:35-40): head h points at angle 2πh/M, point p at
    radius p+1."""
    thetas = jnp.arange(n_heads, dtype=jnp.float32) * (2.0 * math.pi / n_heads)
    grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], axis=-1)  # [M, 2]
    grid = grid / jnp.max(jnp.abs(grid), axis=-1, keepdims=True)
    grid = jnp.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    scale = jnp.arange(1, n_points + 1, dtype=jnp.float32)[None, None, :, None]
    return (grid * scale).reshape(-1)


class _ValueProjAfterPool(nn.Module):
    """Value projection applied AFTER raw-row pooling (gather-then-project;
    exact by linearity — see ops.msda.ms_deform_attn_raw_pool). Param names
    (kernel, bias) and init match nn.Dense so the tree is interchangeable
    with the project-then-gather path."""

    d_model: int

    @nn.compact
    def __call__(self, pooled, wsum):
        # pooled [B, Lq, M, C], wsum [B, Lq, M]
        c, m = pooled.shape[-1], pooled.shape[2]
        dh = self.d_model // m
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (c, self.d_model)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.d_model,))
        k = kernel.astype(pooled.dtype).reshape(c, m, dh)
        out = jnp.einsum("bqmc,cmd->bqmd", pooled, k)
        # each gathered value row carried the projection bias, weighted by
        # its (bilinear x attention) weight — restore it via the weight sum
        out = out + (wsum[..., None] * bias.reshape(m, dh)).astype(out.dtype)
        b, lq = out.shape[:2]
        return out.reshape(b, lq, self.d_model)


class MSDeformAttn(nn.Module):
    """Multi-scale deformable attention module (reference
    ops/modules/ms_deform_attn.py:15-91): linears produce per-query sampling
    offsets and softmax attention weights; sampling runs in the MSDA core."""

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    # perf variants (TPU gather cost is per row — both cut rows):
    # shared_locs: one set of sampling locations shared by all heads
    # (weights stay per-head) -> M x fewer gather rows;
    # top_k > 0: DEFA-style pruning (PAPERS.md 2403.10913) — gather only
    # the top_k of L*P samples per (query, head) by attention weight.
    shared_locs: bool = False
    top_k: int = 0
    # int8 value tables at INFERENCE (deterministic=True): halves the
    # gather bytes and table size (both measured speed levers,
    # scripts/gather_bw_probe.py); per-(batch, head) absmax scales fold
    # into the corner weights. Training always runs the exact bf16 path.
    int8_values: bool = False
    # gather-then-project (exact by linearity): sample RAW src rows and
    # apply the value projection after pooling. Right when the per-query
    # row count is small relative to S (decoder cross-attn): kills the
    # per-layer per-head quad value tables, and the layer-invariant raw
    # quad table is CSE'd across decoder layers.
    gather_raw: bool = False
    # Replicate the fork's swapped offset normalizer: reference
    # ms_deform_attn.py:78-79 divides 2-dim-reference offsets by
    # input_spatial_shapes, which is (H, W) — upstream Deformable-DETR
    # uses (W, H). We default to the upstream-correct order; checkpoints
    # TRAINED with the fork need this flag for bit-faithful inference.
    ref_normalizer: bool = False

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Lq, C]
        reference_points: jnp.ndarray,  # [B, Lq, L, 2 or 4], in [0, 1]
        src: jnp.ndarray,  # [B, S, C]
        spatial_shapes: Sequence[Tuple[int, int]],
        src_padding_mask: Optional[jnp.ndarray] = None,  # [B, S] True=pad
        query_mask: Optional[jnp.ndarray] = None,  # [B, Lq] True=masked
        deterministic: bool = True,
        src_quad: Optional[jnp.ndarray] = None,  # prebuilt [B, S, 4C] quad
        # table of (masked) src — gather_raw only; lets the caller cache it
        src_quad_scales: Optional[jnp.ndarray] = None,  # [B, L] per-level
        # dequant scales when src_quad is int8 (dec_int8_quad)
    ) -> jnp.ndarray:
        b, lq, _ = query.shape
        m, l, p = self.n_heads, self.n_levels, self.n_points
        d_head = self.d_model // m
        assert not (self.shared_locs and self.top_k), (
            "shared_locs and top_k are separate variants; enable one"
        )

        if not self.gather_raw:
            value = nn.Dense(self.d_model, name="value_proj")(src)
            if src_padding_mask is not None:
                value = jnp.where(src_padding_mask[..., None], 0.0, value)
            value = value.reshape(b, -1, m, d_head)

        m_loc = 1 if self.shared_locs else m
        offsets = nn.Dense(
            m_loc * l * p * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: _offset_grid_init(
                m_loc, l, p
            ).astype(dtype),
            name="sampling_offsets",
        )(query).reshape(b, lq, m_loc, l, p, 2)
        attn = nn.Dense(
            m * l * p,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(b, lq, m, l * p)
        attn = jax.nn.softmax(attn, axis=-1).reshape(b, lq, m, l, p)
        if query_mask is not None:
            attn = jnp.where(query_mask[:, :, None, None, None], 0.0, attn)

        wh = jnp.asarray(
            [(h, w) if self.ref_normalizer else (w, h)
             for h, w in spatial_shapes],
            jnp.float32,
        )  # (W, H) normalizer — upstream-correct order (see ref_normalizer)
        if reference_points.shape[-1] == 2:
            loc = (
                reference_points[:, :, None, :, None, :]
                + offsets / wh[None, None, None, :, None, :]
            )
        else:
            loc = (
                reference_points[:, :, None, :, None, :2]
                + offsets / p * reference_points[:, :, None, :, None, 2:] * 0.5
            )

        # sampling core runs in the value dtype (bf16 under mixed precision);
        # coordinates/weights stay fp32 inside the op
        if self.gather_raw:
            assert not (self.shared_locs or self.top_k or self.int8_values)
            src_m = src
            valid_extents = None
            if src_padding_mask is not None:
                if src_quad is None:
                    src_m = jnp.where(src_padding_mask[..., None], 0.0, src_m)
                # per-level valid extents (pad is a bottom/right rectangle —
                # the codebase-wide get_valid_ratio assumption): pad-hitting
                # corners must not contribute to the bias-restore weight sum,
                # matching the exact path's zeroing of value_proj bias at
                # padded rows (advisor round-2 high finding)
                ext, cur = [], 0
                for h, w in spatial_shapes:
                    m_l = src_padding_mask[:, cur : cur + h * w].reshape(
                        b, h, w
                    )
                    vh = jnp.sum(~m_l[:, :, 0], axis=1)
                    vw = jnp.sum(~m_l[:, 0, :], axis=1)
                    ext.append(jnp.stack([vh, vw], axis=-1))
                    cur += h * w
                valid_extents = jnp.stack(ext, axis=1).astype(jnp.float32)
            pooled, wsum = ms_deform_attn_raw_pool(
                src_m,
                tuple(spatial_shapes),
                loc.astype(jnp.float32),
                attn.astype(jnp.float32),
                src_quad,
                valid_extents,
                quad_scales=src_quad_scales,
            )
            out = _ValueProjAfterPool(self.d_model, name="value_proj")(
                pooled.astype(src.dtype), wsum
            )
        elif self.shared_locs:
            out = ms_deform_attn_patch_shared(
                value,
                tuple(spatial_shapes),
                loc[:, :, 0].astype(jnp.float32),
                attn.astype(jnp.float32),
            )
        elif self.top_k and self.top_k < l * p:
            out = ms_deform_attn_topk_quad(
                value,
                tuple(spatial_shapes),
                loc.astype(jnp.float32),
                attn.astype(jnp.float32),
                top_k=self.top_k,
            )
        elif self.int8_values and deterministic:
            absmax = jnp.max(
                jnp.abs(value.astype(jnp.float32)), axis=(1, 3), keepdims=True
            )  # [B, 1, M, 1]
            scale = jnp.maximum(absmax / 127.0, 1e-8)
            q8 = jnp.clip(
                jnp.round(value.astype(jnp.float32) / scale), -127, 127
            ).astype(jnp.int8)
            out = ms_deform_attn(
                q8,
                tuple(spatial_shapes),
                loc.astype(jnp.float32),
                attn.astype(jnp.float32),
                value_scale=scale[:, 0, :, 0].astype(value.dtype),
            )
        else:
            out = ms_deform_attn(
                value,
                tuple(spatial_shapes),
                loc.astype(jnp.float32),
                attn.astype(jnp.float32),
            )
        out = out.astype(query.dtype)
        return nn.Dense(self.d_model, name="output_proj")(out)


def _ffn(x, d_ffn, d_model, dropout, activation, deterministic):
    act = {"relu": nn.relu, "gelu": nn.gelu}[activation]
    h = nn.Dense(d_ffn)(x)
    h = nn.Dropout(dropout, deterministic=deterministic)(act(h))
    h = nn.Dense(d_model)(h)
    return h


class DeformableEncoderLayer(nn.Module):
    d_model: int
    d_ffn: int
    dropout: float
    activation: str
    n_levels: int
    n_heads: int
    n_points: int
    shared_locs: bool = False
    top_k: int = 0
    int8_values: bool = False
    ref_normalizer: bool = False

    @nn.compact
    def __call__(
        self, src, pos, reference_points, spatial_shapes,
        padding_mask=None, deterministic=True, src_value=None,
    ):
        # src_value: value sequence when the queries are a subset of the
        # tokens (Lite-DETR interleaved update); defaults to src
        q = src + pos if pos is not None else src
        src2 = MSDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            shared_locs=self.shared_locs, top_k=self.top_k,
            int8_values=self.int8_values,
            ref_normalizer=self.ref_normalizer,
            name="self_attn",
        )(
            q, reference_points,
            src if src_value is None else src_value,
            spatial_shapes, padding_mask,
            deterministic=deterministic,
        )
        src = nn.LayerNorm(epsilon=1e-5)(
            src + nn.Dropout(self.dropout, deterministic=deterministic)(src2)
        )
        h = _ffn(src, self.d_ffn, self.d_model, self.dropout, self.activation,
                 deterministic)
        return nn.LayerNorm(epsilon=1e-5)(
            src + nn.Dropout(self.dropout, deterministic=deterministic)(h)
        )


def encoder_reference_points(spatial_shapes, valid_ratios):
    """Per-token per-level reference grid (reference :307-320): token centers
    normalized by the valid (non-padded) extent, then re-scaled per level."""
    refs = []
    for h, w in spatial_shapes:
        ry = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None]
        rx = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :]
        ry = jnp.broadcast_to(ry, (h, w)).reshape(-1)
        rx = jnp.broadcast_to(rx, (h, w)).reshape(-1)
        lvl = len(refs)
        y = ry[None] / (valid_ratios[:, None, lvl, 1] * h)
        x = rx[None] / (valid_ratios[:, None, lvl, 0] * w)
        refs.append(jnp.stack([x, y], axis=-1))  # [B, HW, 2]
    ref = jnp.concatenate(refs, axis=1)  # [B, S, 2]
    return ref[:, :, None, :] * valid_ratios[:, None, :, :]  # [B, S, L, 2]


class DeformableEncoder(nn.Module):
    num_layers: int
    d_model: int
    d_ffn: int
    dropout: float
    activation: str
    n_levels: int
    n_heads: int
    n_points: int
    shared_locs: bool = False
    top_k: int = 0
    int8_values: bool = False
    # Lite-DETR-style interleaved update (arxiv 2303.07335): all layers but
    # the LAST update only the high-level tokens (levels 1..L-1, ~25% of
    # the sequence at flagship scale) as QUERIES — level-0 tokens still
    # serve as values — so per-layer MSDA rows, FFN and einsum work scale
    # by the high-level fraction; the final layer is the paper's low-level
    # feature update: QUERIES = level-0 tokens only (the high-level tokens
    # were just refreshed), values = all tokens.
    lite: bool = False
    # Restrict the final low-level update to sample only from the k FINEST
    # levels (0 = all). Gather cost is per-row and the low-level update is
    # the single most expensive MSDA call (Lq = the full level-0 grid), so
    # dropping sampled levels cuts its rows proportionally; the coarse
    # levels it stops seeing were themselves refreshed from level-0 values.
    lite_low_klevels: int = 0
    # Restrict the HIGH-level (interleaved) updates to sample only from the
    # k finest levels (0 = all): the high-level layers are the dominant
    # per-frame MSDA cost (5 of 6 layers at flagship), and their rows
    # scale with sampled levels x points. k=2 keeps the fine-detail flow
    # (strides 8/16) that Lite-DETR's high-level update exists to collect
    # while dropping the coarse-on-coarse samples, whose content the
    # high-level queries already carry via self-residuals. SEMANTIC change:
    # accuracy-gate with the hard synthetic-MOT benchmark before adopting.
    lite_high_klevels: int = 0
    ref_normalizer: bool = False
    remat: bool = False  # rematerialize layers (trade FLOPs for HBM during
    # training — the encoder activations at 800px are the memory peak)

    @nn.compact
    def __call__(
        self, src, spatial_shapes, valid_ratios, pos=None,
        padding_mask=None, deterministic=True,
    ):
        ref = encoder_reference_points(spatial_shapes, valid_ratios)
        layer_cls = DeformableEncoderLayer
        if self.remat:
            layer_cls = nn.remat(
                DeformableEncoderLayer, static_argnums=(4, 6)
            )
        split0 = spatial_shapes[0][0] * spatial_shapes[0][1]
        out = src
        for i in range(self.num_layers):
            last_lite = (
                self.lite
                and i == self.num_layers - 1
                and len(spatial_shapes) > 1
            )
            high_lite = (
                self.lite
                and i < self.num_layers - 1
                and len(spatial_shapes) > 1
            )
            k = len(spatial_shapes)
            if last_lite and self.lite_low_klevels:
                k = min(self.lite_low_klevels, k)
            if high_lite and self.lite_high_klevels:
                k = min(self.lite_high_klevels, k)
            layer = layer_cls(
                self.d_model, self.d_ffn, self.dropout, self.activation,
                k if (last_lite or high_lite) else self.n_levels,
                self.n_heads, self.n_points,
                shared_locs=self.shared_locs, top_k=self.top_k,
                int8_values=self.int8_values,
                ref_normalizer=self.ref_normalizer,
                name=f"layer{i}",
            )
            if high_lite:
                s_k = int(sum(h * w for h, w in spatial_shapes[:k]))
                high = layer(
                    out[:, split0:],
                    pos[:, split0:] if pos is not None else None,
                    ref[:, split0:, :k], spatial_shapes[:k],
                    padding_mask[:, :s_k] if padding_mask is not None
                    else None,
                    deterministic,
                    out[:, :s_k],  # src_value: the k finest levels
                )
                out = jnp.concatenate([out[:, :split0], high], axis=1)
            elif last_lite:
                # final layer = low-level update (queries: level-0 tokens);
                # values/levels restricted to the k finest levels
                s_k = int(sum(h * w for h, w in spatial_shapes[:k]))
                low = layer(
                    out[:, :split0],
                    pos[:, :split0] if pos is not None else None,
                    ref[:, :split0, :k], spatial_shapes[:k],
                    padding_mask[:, :s_k] if padding_mask is not None
                    else None,
                    deterministic,
                    out[:, :s_k],
                )
                out = jnp.concatenate([low, out[:, split0:]], axis=1)
            else:
                out = layer(
                    out, pos, ref, spatial_shapes, padding_mask, deterministic
                )
        return out


class DeformableDecoderLayer(nn.Module):
    d_model: int
    d_ffn: int
    dropout: float
    activation: str
    n_levels: int
    n_heads: int
    n_points: int
    gather_raw: bool = False  # cross-attn via gather-then-project
    ref_normalizer: bool = False

    @nn.compact
    def __call__(
        self, tgt, query_pos, reference_points, src, spatial_shapes,
        src_padding_mask=None, query_pad_mask=None, deterministic=True,
        src_quad=None, src_quad_scales=None,
    ):
        q = k = tgt + query_pos if query_pos is not None else tgt
        attn_mask = (
            (~query_pad_mask)[:, None, None, :] if query_pad_mask is not None else None
        )
        tgt2 = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            qkv_features=self.d_model,
            dropout_rate=self.dropout,
            name="self_attn",
        )(q, k, tgt, mask=attn_mask, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5)(
            tgt + nn.Dropout(self.dropout, deterministic=deterministic)(tgt2)
        )
        tgt2 = MSDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            gather_raw=self.gather_raw,
            ref_normalizer=self.ref_normalizer,
            name="cross_attn",
        )(
            tgt + query_pos if query_pos is not None else tgt,
            reference_points, src, spatial_shapes, src_padding_mask,
            query_mask=query_pad_mask, src_quad=src_quad,
            src_quad_scales=src_quad_scales,
        )
        tgt = nn.LayerNorm(epsilon=1e-5)(
            tgt + nn.Dropout(self.dropout, deterministic=deterministic)(tgt2)
        )
        h = _ffn(tgt, self.d_ffn, self.d_model, self.dropout, self.activation,
                 deterministic)
        return nn.LayerNorm(epsilon=1e-5)(
            tgt + nn.Dropout(self.dropout, deterministic=deterministic)(h)
        )


class DeformableDecoder(nn.Module):
    """Decoder with iterative box refinement (reference :399-434): when
    `bbox_embed_fns` (per-layer bound head modules) are passed, each layer
    updates the reference points through inverse-sigmoid residuals."""

    num_layers: int
    d_model: int
    d_ffn: int
    dropout: float
    activation: str
    n_levels: int
    n_heads: int
    n_points: int
    gather_raw: bool = False
    ref_normalizer: bool = False

    @nn.compact
    def __call__(
        self, tgt, reference_points, src, spatial_shapes, valid_ratios,
        query_pos=None, src_padding_mask=None, query_pad_mask=None,
        bbox_embed_fns=None, deterministic=True, src_quad=None,
        src_quad_scales=None,
    ):
        output = tgt
        intermediates, inter_refs = [], []
        for i in range(self.num_layers):
            if reference_points.shape[-1] == 4:
                ref_input = (
                    reference_points[:, :, None]
                    * jnp.concatenate([valid_ratios, valid_ratios], -1)[:, None]
                )
            else:
                ref_input = reference_points[:, :, None] * valid_ratios[:, None]
            output = DeformableDecoderLayer(
                self.d_model, self.d_ffn, self.dropout, self.activation,
                self.n_levels, self.n_heads, self.n_points,
                gather_raw=self.gather_raw,
                ref_normalizer=self.ref_normalizer, name=f"layer{i}",
            )(
                output, query_pos, ref_input, src, spatial_shapes,
                src_padding_mask, query_pad_mask, deterministic, src_quad,
                src_quad_scales,
            )
            if bbox_embed_fns is not None:
                tmp = bbox_embed_fns[i](output)
                if reference_points.shape[-1] == 4:
                    new_ref = jax.nn.sigmoid(tmp + inverse_sigmoid(reference_points))
                else:
                    xy = tmp[..., :2] + inverse_sigmoid(reference_points)
                    new_ref = jax.nn.sigmoid(
                        jnp.concatenate([xy, tmp[..., 2:]], -1)
                    )
                reference_points = jax.lax.stop_gradient(new_ref)
            intermediates.append(output)
            inter_refs.append(reference_points)
        return jnp.stack(intermediates), jnp.stack(inter_refs)


def get_valid_ratio(mask: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W] pad mask -> [B, 2] (w_ratio, h_ratio) (reference :124-131)."""
    _, h, w = mask.shape
    valid_h = jnp.sum(~mask[:, :, 0], axis=1).astype(jnp.float32)
    valid_w = jnp.sum(~mask[:, 0, :], axis=1).astype(jnp.float32)
    return jnp.stack([valid_w / w, valid_h / h], axis=-1)


def proposal_pos_embed(proposals: jnp.ndarray, num_pos_feats: int = 128):
    """Sine embedding of (unactivated) proposal boxes (reference :78-91)."""
    scale = 2 * math.pi
    t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = 10000.0 ** (2 * jnp.floor(t / 2) / num_pos_feats)
    p = jax.nn.sigmoid(proposals) * scale
    pos = p[..., None] / dim_t  # [B, Q, 4, F]
    pos = jnp.stack(
        [jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])], axis=-1
    ).reshape(*pos.shape[:-2], -1)
    return pos.reshape(*proposals.shape[:-1], -1)


class DeformableTransformer(nn.Module):
    """Top-level deformable transformer (reference :21-257)."""

    d_model: int = 256
    nheads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 1024
    dropout: float = 0.1
    activation: str = "relu"
    num_feature_levels: int = 4
    dec_n_points: int = 4
    enc_n_points: int = 4
    two_stage: bool = False
    two_stage_num_proposals: int = 300
    multi_frame_attention_separate_encoder: bool = False
    # frame-slot-agnostic encoder: both frames' halves get the SAME per-level
    # embeds (index i % half), so a frame's encoded memory is identical
    # whether it is the current or the previous frame — enabling the tracker
    # to cache last step's encoded memory instead of re-encoding (the
    # reference re-encodes both frames every step,
    # deformable_transformer.py:160-173). The decoder still distinguishes
    # frames via its per-level (0..2L-1) sampling offset/attention params.
    frame_agnostic_levels: bool = False
    enc_shared_locs: bool = False  # encoder MSDA: head-shared locations
    enc_topk: int = 0  # encoder MSDA: DEFA-style top-k sample pruning
    enc_int8: bool = False  # encoder MSDA: int8 value tables at inference
    enc_lite: bool = False  # Lite-DETR interleaved high-level update
    enc_lite_klevels: int = 0  # low-level update: sample k finest levels
    enc_lite_high_klevels: int = 0  # high-level updates: k finest levels
    dec_gather_raw: bool = False  # decoder cross-attn gather-then-project
    dec_int8_quad: bool = False  # int8 decoder quad tables at inference
    # (accuracy-unsafe: quantization error; gate via allow_lossy)
    # Decoder cross-attn samples only the k FINEST levels of EACH frame
    # (0 = all). Gather cost is per-row and decoder rows scale linearly
    # with sampled levels, so k=2 halves the decoder MSDA rows at the
    # flagship 4-levels-per-frame config while keeping the per-frame
    # temporal split (the decoder still samples BOTH frames — that is
    # where multi-frame association information enters the queries).
    # SEMANTIC change (the per-level offset/weight params shrink to
    # k*frames levels — not torch-checkpoint-compatible when set):
    # accuracy-gate with the chip-scale hard synthetic-MOT session
    # before adopting, like enc_lite_high_klevels.
    dec_klevels: int = 0
    msda_ref_normalizer: bool = False  # fork (H, W) offset normalizer
    remat: bool = False

    def _dec_frames_half(self):
        frames = 2 if self.multi_frame_attention_separate_encoder else 1
        half = self.num_feature_levels // frames
        k = min(self.dec_klevels, half) if self.dec_klevels else half
        return frames, half, k

    def setup(self):
        enc_levels = self.num_feature_levels
        if self.multi_frame_attention_separate_encoder:
            enc_levels //= 2
        self.encoder = DeformableEncoder(
            self.num_encoder_layers, self.d_model, self.dim_feedforward,
            self.dropout, self.activation, enc_levels, self.nheads,
            self.enc_n_points, shared_locs=self.enc_shared_locs,
            top_k=self.enc_topk, int8_values=self.enc_int8,
            lite=self.enc_lite, lite_low_klevels=self.enc_lite_klevels,
            lite_high_klevels=self.enc_lite_high_klevels,
            ref_normalizer=self.msda_ref_normalizer,
            remat=self.remat,
        )
        dec_frames, _, dec_k = self._dec_frames_half()
        self.decoder = DeformableDecoder(
            self.num_decoder_layers, self.d_model, self.dim_feedforward,
            self.dropout, self.activation, dec_k * dec_frames,
            self.nheads, self.dec_n_points, gather_raw=self.dec_gather_raw,
            ref_normalizer=self.msda_ref_normalizer,
        )
        self.level_embed = self.param(
            "level_embed",
            nn.initializers.normal(1.0),
            (self.num_feature_levels, self.d_model),
        )
        if self.two_stage:
            self.enc_output = nn.Dense(self.d_model)
            self.enc_output_norm = nn.LayerNorm(epsilon=1e-5)
            self.pos_trans = nn.Dense(self.d_model * 2)
            self.pos_trans_norm = nn.LayerNorm(epsilon=1e-5)
        else:
            self.reference_points_head = nn.Dense(2)

    def gen_encoder_output_proposals(self, memory, memory_pad_mask, spatial_shapes):
        """Two-stage proposal grid (reference :92-122)."""
        b = memory.shape[0]
        proposals = []
        cur = 0
        for lvl, (h, w) in enumerate(spatial_shapes):
            mask_l = memory_pad_mask[:, cur : cur + h * w].reshape(b, h, w)
            valid_h = jnp.sum(~mask_l[:, :, 0], axis=1).astype(jnp.float32)
            valid_w = jnp.sum(~mask_l[:, 0, :], axis=1).astype(jnp.float32)
            gy = jnp.broadcast_to(
                jnp.arange(h, dtype=jnp.float32)[:, None], (h, w)
            )
            gx = jnp.broadcast_to(
                jnp.arange(w, dtype=jnp.float32)[None, :], (h, w)
            )
            grid = jnp.stack([gx, gy], -1).reshape(1, h * w, 2)
            scale = jnp.stack([valid_w, valid_h], -1)[:, None, :]
            grid = (grid + 0.5) / scale
            wh = jnp.ones_like(grid) * 0.05 * (2.0**lvl)
            proposals.append(jnp.concatenate([grid, wh], -1))
            cur += h * w
        props = jnp.concatenate(proposals, axis=1)  # [B, S, 4]
        valid = ((props > 0.01) & (props < 0.99)).all(-1, keepdims=True)
        props = jnp.log(props / (1 - jnp.clip(props, 1e-6, 1 - 1e-6)))
        bad = memory_pad_mask[..., None] | ~valid
        props = jnp.where(bad, jnp.inf, props)
        out_mem = jnp.where(bad, 0.0, memory)
        out_mem = self.enc_output_norm(self.enc_output(out_mem))
        return out_mem, props

    def __call__(
        self,
        srcs,  # list of [B, H, W, C]
        masks,  # list of [B, H, W] bool
        pos_embeds,  # list of [B, H, W, C]
        query_embed=None,  # [Q, 2C] or None (two-stage)
        track_query_embeds=None,  # [B, T, C]
        track_query_boxes=None,  # [B, T, 4]
        track_query_active=None,  # [B, T] bool
        class_embed_fn=None,  # two-stage scoring head (bound module)
        bbox_embed_fn=None,  # two-stage box head
        bbox_embed_fns=None,  # per-layer refine heads
        prev_encoded=None,  # [B, S_half, C] cached prev-frame encoder memory
        prev_masks=None,  # per-level prev pad masks (with prev_encoded)
        prev_is_current=False,  # first frame: reuse mem_cur as mem_prev
        prev_quad=None,  # [B, S_half, 4C] cached prev-frame decoder quad
        # table (with prev_encoded + dec_gather_raw): identical to what the
        # previous step built for its current half
        deterministic=True,
    ):
        b = srcs[0].shape[0]
        half_l = self.num_feature_levels // 2
        lvl_embed_idx = (
            (lambda i: i % half_l)
            if self.frame_agnostic_levels
            and self.multi_frame_attention_separate_encoder
            else (lambda i: i)
        )

        if prev_encoded is not None or prev_is_current:
            # cached-memory path: srcs/masks/pos_embeds carry the CURRENT
            # frame's half only; the prev half is supplied pre-encoded (or
            # aliased to the current frame's memory on the first frame)
            assert self.multi_frame_attention_separate_encoder
            assert self.frame_agnostic_levels, (
                "prev-memory caching requires the frame-agnostic encoder"
            )
            spatial_cur = tuple((s.shape[1], s.shape[2]) for s in srcs)
            spatial_shapes = spatial_cur + spatial_cur
            src_flat = jnp.concatenate(
                [s.reshape(b, -1, self.d_model) for s in srcs], axis=1
            )
            mask_cur = jnp.concatenate(
                [m.reshape(b, -1) for m in masks], axis=1
            )
            pos_flat = jnp.concatenate(
                [
                    p.reshape(b, -1, self.d_model)
                    + self.level_embed[i][None, None]
                    for i, p in enumerate(pos_embeds)
                ],
                axis=1,
            ).astype(src_flat.dtype)
            vr_cur = jnp.stack([get_valid_ratio(m) for m in masks], axis=1)
            mem_cur = self.encoder(
                src_flat, spatial_cur, vr_cur, pos_flat, mask_cur,
                deterministic,
            )
            if prev_is_current:
                mem_prev, mask_prev, vr_prev = mem_cur, mask_cur, vr_cur
            else:
                mem_prev = prev_encoded.astype(mem_cur.dtype)
                mask_prev = jnp.concatenate(
                    [m.reshape(b, -1) for m in prev_masks], axis=1
                )
                vr_prev = jnp.stack(
                    [get_valid_ratio(m) for m in prev_masks], axis=1
                )
            memory = jnp.concatenate([mem_cur, mem_prev], axis=1)
            mask_flat = jnp.concatenate([mask_cur, mask_prev], axis=1)
            valid_ratios = jnp.concatenate([vr_cur, vr_prev], axis=1)
        else:
            spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
            src_flat = jnp.concatenate(
                [s.reshape(b, -1, self.d_model) for s in srcs], axis=1
            )
            mask_flat = jnp.concatenate(
                [m.reshape(b, -1) for m in masks], axis=1
            )
            pos_flat = jnp.concatenate(
                [
                    p.reshape(b, -1, self.d_model)
                    + self.level_embed[lvl_embed_idx(i)][None, None]
                    for i, p in enumerate(pos_embeds)
                ],
                axis=1,
            ).astype(src_flat.dtype)
            valid_ratios = jnp.stack(
                [get_valid_ratio(m) for m in masks], axis=1
            )

            if self.multi_frame_attention_separate_encoder:
                # two frames, half the levels each (reference :160-173); the
                # CURRENT frame occupies the first half of the list here
                # (deformable_detr emits [cur levels..., prev levels...])
                split = sum(h * w for h, w in spatial_shapes[:half_l])
                mem_cur = self.encoder(
                    src_flat[:, :split], spatial_shapes[:half_l],
                    valid_ratios[:, :half_l], pos_flat[:, :split],
                    mask_flat[:, :split], deterministic,
                )
                mem_prev = self.encoder(
                    src_flat[:, split:], spatial_shapes[half_l:],
                    valid_ratios[:, half_l:], pos_flat[:, split:],
                    mask_flat[:, split:], deterministic,
                )
                memory = jnp.concatenate([mem_cur, mem_prev], axis=1)
            else:
                memory = self.encoder(
                    src_flat, spatial_shapes, valid_ratios, pos_flat,
                    mask_flat, deterministic,
                )

        enc_outputs_class = None
        enc_outputs_coord_unact = None
        query_pad_mask = None
        if self.two_stage:
            out_mem, props = self.gen_encoder_output_proposals(
                memory, mask_flat, spatial_shapes
            )
            enc_outputs_class = class_embed_fn(out_mem)
            delta = bbox_embed_fn(out_mem)
            enc_outputs_coord_unact = jnp.where(
                jnp.isinf(props), props, delta + jnp.nan_to_num(props, posinf=0.0)
            )
            topk = self.two_stage_num_proposals
            score = jnp.where(
                jnp.isinf(props[..., 0]), -jnp.inf, enc_outputs_class[..., 0]
            )
            _, topk_idx = jax.lax.top_k(score, topk)
            topk_coords = jnp.take_along_axis(
                enc_outputs_coord_unact, topk_idx[..., None], axis=1
            )
            topk_coords = jax.lax.stop_gradient(topk_coords)
            reference_points = jax.nn.sigmoid(topk_coords)
            pos_trans = self.pos_trans_norm(
                self.pos_trans(proposal_pos_embed(topk_coords, self.d_model // 2))
            )
            query_pos, tgt = jnp.split(pos_trans, 2, axis=-1)
        else:
            query_pos, tgt = jnp.split(query_embed, 2, axis=-1)
            query_pos = jnp.broadcast_to(query_pos[None], (b, *query_pos.shape))
            tgt = jnp.broadcast_to(tgt[None], (b, *tgt.shape)).astype(
                src_flat.dtype
            )
            reference_points = jax.nn.sigmoid(
                self.reference_points_head(query_pos)
            )
            if track_query_embeds is not None:
                t = track_query_embeds.shape[1]
                active = track_query_active
                tq = jnp.where(
                    active[..., None], track_query_embeds, 0.0
                ).astype(src_flat.dtype)
                query_pos = jnp.concatenate(
                    [jnp.zeros((b, t, self.d_model), src_flat.dtype), query_pos],
                    axis=1,
                )
                tgt = jnp.concatenate([tq, tgt], axis=1)
                reference_points = jnp.concatenate(
                    [track_query_boxes[..., :2], reference_points], axis=1
                )
                query_pad_mask = jnp.concatenate(
                    [~active, jnp.zeros((b, tgt.shape[1] - t), bool)], axis=1
                )

        init_reference = reference_points

        # dec_klevels: restrict what the DECODER cross-attn samples to the
        # k finest levels of EACH frame. The finest levels are a contiguous
        # prefix of each frame's half in the level-major token layout, so
        # each frame contributes one slice. Everything downstream (quad
        # tables, pad mask, valid ratios, reference-point scaling) uses the
        # restricted views; the returned `memory` stays full (two-stage
        # proposals and segmentation heads consume all levels).
        frames_dec, half_dec, k_dec = self._dec_frames_half()
        if k_dec < half_dec:
            lvl_starts = [0]
            for h, w in spatial_shapes:
                lvl_starts.append(lvl_starts[-1] + h * w)
            kept = [
                f * half_dec + j for f in range(frames_dec) for j in range(k_dec)
            ]
            spans = [
                (lvl_starts[f * half_dec], lvl_starts[f * half_dec + k_dec])
                for f in range(frames_dec)
            ]

            def keep_tokens(x):
                parts = [x[:, a:b] for a, b in spans]
                return parts[0] if len(parts) == 1 else jnp.concatenate(
                    parts, axis=1
                )

            dec_shapes = tuple(spatial_shapes[i] for i in kept)
            dec_memory = keep_tokens(memory)
            dec_mask = keep_tokens(mask_flat)
            dec_vr = valid_ratios[:, jnp.asarray(kept)]
        else:
            dec_shapes = tuple(spatial_shapes)
            dec_memory, dec_mask, dec_vr = memory, mask_flat, valid_ratios
        dec_half_l = len(dec_shapes) // 2  # kept levels per frame (cached path)

        src_quad = None
        quad_cur = None  # bf16 array, or (int8 table, scale [B]) cache item
        src_quad_scales = None
        if self.dec_gather_raw:
            # decoder cross-attn value table, built ONCE for all layers
            # (layer-invariant: gather_raw samples pre-projection memory).
            # In the cached-memory path the halves are built separately so
            # the prev half can come from last step's cache. With
            # dec_int8_quad (inference only) the tables are symmetric-int8
            # with a per-half scalar scale — halves the byte-bound decoder
            # gather bytes; each cached half carries its own frame's scale.
            from ..ops.msda import build_raw_quad, quantize_rows

            int8 = self.dec_int8_quad and deterministic

            def make_table(masked, shapes):
                if not int8:
                    return build_raw_quad(masked, shapes), None
                q8, s8 = quantize_rows(masked)
                return build_raw_quad(q8, shapes), s8

            if prev_encoded is not None or prev_is_current:
                half_shapes = dec_shapes[:dec_half_l]
                s_half = sum(h * w for h, w in half_shapes)
                tbl_cur, s_cur = make_table(
                    jnp.where(
                        dec_mask[:, :s_half, None], 0.0, dec_memory[:, :s_half]
                    ),
                    half_shapes,
                )
                quad_cur = (tbl_cur, s_cur) if int8 else tbl_cur
                if prev_is_current:
                    tbl_prev, s_prev = tbl_cur, s_cur
                elif prev_quad is not None:
                    # the cached table kind must match the decoder mode: an
                    # exact-model (plain array) cache fed to the int8 path
                    # would be silently truncated to garbage, and vice versa
                    if int8 != isinstance(prev_quad, tuple):
                        raise ValueError(
                            "prev_quad cache kind does not match "
                            "dec_msda_int8 — caches are not transferable "
                            "between the exact and int8 decoder paths; "
                            "reset the tracker when toggling the flag"
                        )
                    if int8:
                        tbl_prev, s_prev = prev_quad
                    else:
                        tbl_prev = prev_quad.astype(tbl_cur.dtype)
                        s_prev = None
                else:
                    tbl_prev, s_prev = make_table(
                        jnp.where(
                            dec_mask[:, s_half:, None], 0.0,
                            dec_memory[:, s_half:],
                        ),
                        dec_shapes[dec_half_l:],
                    )
                src_quad = jnp.concatenate([tbl_cur, tbl_prev], axis=1)
                if int8:
                    src_quad_scales = jnp.concatenate(
                        [
                            jnp.tile(s_cur[:, None], (1, dec_half_l)),
                            jnp.tile(
                                s_prev[:, None],
                                (1, len(dec_shapes) - dec_half_l),
                            ),
                        ],
                        axis=1,
                    )
            else:
                src_quad, s_all = make_table(
                    jnp.where(dec_mask[..., None], 0.0, dec_memory),
                    dec_shapes,
                )
                if int8:
                    src_quad_scales = jnp.tile(
                        s_all[:, None], (1, len(dec_shapes))
                    )
        hs, inter_refs = self.decoder(
            tgt, reference_points, dec_memory, dec_shapes, dec_vr,
            query_pos, dec_mask, query_pad_mask, bbox_embed_fns, deterministic,
            src_quad, src_quad_scales,
        )
        return (
            hs, memory, init_reference, inter_refs,
            enc_outputs_class, enc_outputs_coord_unact, query_pad_mask,
            quad_cur,
        )
