"""Vanilla + kinematic transformers (reference: src/trackformer/models/transformer.py).

Differences from the reference, by design:
- attention masks are additive-bias style built from boolean validity masks
  (static shapes; the reference concatenates variable-length track queries,
  transformer.py:51-84 — here track-query slots are fixed and masked),
- layout is [B, L, D] batch-first throughout (torch MHA is [L, B, D]),
- returns all decoder-layer intermediates like the reference
  (TransformerDecoder.forward :281-322).

Covers:
- Transformer (encoder-decoder, pre/post-norm)          reference :19-84, 242-500
- track_attention: per-layer track-query self-attention  reference :277-307
- KinematicTransformer (detections -> enc-dec)           reference :87-142
- DualKinematicTransformer + IntertwinedBranch fusion    reference :145-185, 470-485
- DualKinematicEncoder (encoder-only variant)            reference :188-239
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

def mha_attention_bias(key_pad_mask: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """[B, Lk] bool (True = pad) -> flax attention mask [B, 1, 1, Lk]
    (True = may attend)."""
    if key_pad_mask is None:
        return None
    return (~key_pad_mask)[:, None, None, :]


class _SelfAttnBlock(nn.Module):
    num_heads: int
    d_model: int
    dropout: float
    sow_attn: bool = False  # sow attention weights into 'intermediates'
    # (≙ the reference's forward hooks for attention-map visualization,
    # tracker.py:39-62)

    @nn.compact
    def __call__(self, src_q, src_k, src_v, mask, deterministic):
        return nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.d_model,
            out_features=self.d_model,
            dropout_rate=self.dropout,
        )(
            src_q, src_k, src_v, mask=mask, deterministic=deterministic,
            sow_weights=self.sow_attn,
        )


def _ffn(x, dim_feedforward, d_model, dropout, activation, deterministic):
    h = nn.Dense(dim_feedforward)(x)
    h = {"relu": nn.relu, "gelu": nn.gelu, "glu": nn.glu, "prelu": nn.relu}[
        activation
    ](h)
    h = nn.Dropout(dropout, deterministic=deterministic)(h)
    return nn.Dense(d_model)(h)


class TransformerEncoderLayer(nn.Module):
    """Post/pre-norm encoder layer (reference :325-380)."""

    d_model: int
    nheads: int
    dim_feedforward: int
    dropout: float = 0.1
    activation: str = "relu"
    pre_norm: bool = False

    @nn.compact
    def __call__(self, src, pos, key_pad_mask=None, deterministic=True):
        bias = mha_attention_bias(key_pad_mask)

        def sa(x):
            q = k = x + pos if pos is not None else x
            return _SelfAttnBlock(self.nheads, self.d_model, self.dropout)(
                q, k, x, bias, deterministic
            )

        if self.pre_norm:
            h = nn.LayerNorm(epsilon=1e-5)(src)
            src = src + nn.Dropout(self.dropout, deterministic=deterministic)(sa(h))
            h = nn.LayerNorm(epsilon=1e-5)(src)
            src = src + nn.Dropout(self.dropout, deterministic=deterministic)(
                _ffn(h, self.dim_feedforward, self.d_model, self.dropout,
                     self.activation, deterministic)
            )
        else:
            src = nn.LayerNorm(epsilon=1e-5)(
                src + nn.Dropout(self.dropout, deterministic=deterministic)(sa(src))
            )
            src = nn.LayerNorm(epsilon=1e-5)(
                src
                + nn.Dropout(self.dropout, deterministic=deterministic)(
                    _ffn(src, self.dim_feedforward, self.d_model, self.dropout,
                         self.activation, deterministic)
                )
            )
        return src


class TransformerDecoderLayer(nn.Module):
    """Self-attn over queries + cross-attn to memory (reference :383-467)."""

    d_model: int
    nheads: int
    dim_feedforward: int
    dropout: float = 0.1
    activation: str = "relu"
    pre_norm: bool = False
    sow_cross_attn: bool = False

    @nn.compact
    def __call__(
        self,
        tgt,
        memory,
        query_pos,
        mem_pos,
        mem_key_pad_mask=None,
        tgt_key_pad_mask=None,
        deterministic=True,
    ):
        mem_bias = mha_attention_bias(mem_key_pad_mask)
        tgt_bias = mha_attention_bias(tgt_key_pad_mask)

        def self_attn(x):
            q = k = x + query_pos if query_pos is not None else x
            return _SelfAttnBlock(self.nheads, self.d_model, self.dropout)(
                q, k, x, tgt_bias, deterministic
            )

        def cross_attn(x):
            q = x + query_pos if query_pos is not None else x
            k = memory + mem_pos if mem_pos is not None else memory
            return _SelfAttnBlock(
                self.nheads, self.d_model, self.dropout,
                sow_attn=self.sow_cross_attn, name="cross_attn",
            )(q, k, memory, mem_bias, deterministic)

        drop = lambda y: nn.Dropout(self.dropout, deterministic=deterministic)(y)
        if self.pre_norm:
            tgt = tgt + drop(self_attn(nn.LayerNorm(epsilon=1e-5)(tgt)))
            tgt = tgt + drop(cross_attn(nn.LayerNorm(epsilon=1e-5)(tgt)))
            tgt = tgt + drop(
                _ffn(nn.LayerNorm(epsilon=1e-5)(tgt), self.dim_feedforward, self.d_model,
                     self.dropout, self.activation, deterministic)
            )
        else:
            tgt = nn.LayerNorm(epsilon=1e-5)(tgt + drop(self_attn(tgt)))
            tgt = nn.LayerNorm(epsilon=1e-5)(tgt + drop(cross_attn(tgt)))
            tgt = nn.LayerNorm(epsilon=1e-5)(
                tgt
                + drop(
                    _ffn(tgt, self.dim_feedforward, self.d_model, self.dropout,
                         self.activation, deterministic)
                )
            )
        return tgt


class TransformerEncoder(nn.Module):
    num_layers: int
    d_model: int
    nheads: int
    dim_feedforward: int
    dropout: float = 0.1
    activation: str = "relu"
    pre_norm: bool = False

    @nn.compact
    def __call__(self, src, pos, key_pad_mask=None, deterministic=True):
        for i in range(self.num_layers):
            src = TransformerEncoderLayer(
                self.d_model, self.nheads, self.dim_feedforward, self.dropout,
                self.activation, self.pre_norm, name=f"layer{i}",
            )(src, pos, key_pad_mask, deterministic)
        if self.pre_norm:
            src = nn.LayerNorm(epsilon=1e-5)(src)
        return src


class TransformerDecoder(nn.Module):
    """Returns stacked intermediates [num_layers, B, Lq, D] (reference :281-322).

    track_attention: before each decoder layer, the track-query slots get an
    extra self-attention block of their own (reference :277-307 applies
    TrackAttentionLayers to the first `tgt[:-100]` queries; here the split
    is an explicit static `num_track_slots`, not a hardcoded -100).
    """

    num_layers: int
    d_model: int
    nheads: int
    dim_feedforward: int
    dropout: float = 0.1
    activation: str = "relu"
    pre_norm: bool = False
    return_intermediate: bool = True
    track_attention: bool = False
    num_track_slots: int = 0
    sow_attention: bool = False  # sow last-layer cross-attn weights

    @nn.compact
    def __call__(
        self,
        tgt,
        memory,
        query_pos,
        mem_pos,
        mem_key_pad_mask=None,
        tgt_key_pad_mask=None,
        deterministic=True,
    ):
        intermediates = []
        final_norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        for i in range(self.num_layers):
            if self.track_attention and self.num_track_slots > 0:
                t = self.num_track_slots
                track_part = tgt[:, :t]
                track_pos = query_pos[:, :t] if query_pos is not None else None
                track_pad = (
                    tgt_key_pad_mask[:, :t] if tgt_key_pad_mask is not None else None
                )
                updated = TransformerDecoderLayerTrack(
                    self.d_model, self.nheads, self.dropout, name=f"track_layer{i}"
                )(track_part, track_pos, track_pad, deterministic)
                tgt = jnp.concatenate([updated, tgt[:, t:]], axis=1)
            tgt = TransformerDecoderLayer(
                self.d_model, self.nheads, self.dim_feedforward, self.dropout,
                self.activation, self.pre_norm,
                sow_cross_attn=(
                    self.sow_attention and i == self.num_layers - 1
                ),
                name=f"layer{i}",
            )(
                tgt, memory, query_pos, mem_pos, mem_key_pad_mask,
                tgt_key_pad_mask, deterministic,
            )
            # shared final norm on every intermediate (DETR applies
            # decoder.norm to each layer's output regardless of pre/post)
            intermediates.append(tgt)
        # returns (normed, raw): the reference decoder returns
        # (self.norm(output), output) (transformer.py:321) — heads consume
        # the normed stack, while hs_embed (the track-query feedback) is the
        # RAW last-layer output (detr.py:135,271 hs_without_norm[-1])
        raw = (
            jnp.stack(intermediates, axis=0)
            if self.return_intermediate
            else intermediates[-1][None]
        )
        return final_norm(raw), raw


class TransformerDecoderLayerTrack(nn.Module):
    """Self-attention block over track queries only (reference :242-274)."""

    d_model: int
    nheads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tgt, query_pos, key_pad_mask=None, deterministic=True):
        bias = mha_attention_bias(key_pad_mask)
        q = k = tgt + query_pos if query_pos is not None else tgt
        h = _SelfAttnBlock(self.nheads, self.d_model, self.dropout)(
            q, k, tgt, bias, deterministic
        )
        return nn.LayerNorm(epsilon=1e-5)(
            tgt + nn.Dropout(self.dropout, deterministic=deterministic)(h)
        )


class Transformer(nn.Module):
    """DETR transformer (reference :19-84): flattens [B,H,W,D] memory is done
    by the caller; takes src [B, L, D], pos [B, L, D], queries [B, Q, D]."""

    d_model: int = 256
    nheads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    pre_norm: bool = False
    return_intermediate_dec: bool = True
    track_attention: bool = False
    num_track_slots: int = 0
    sow_attention: bool = False

    @nn.compact
    def __call__(
        self,
        src,
        src_pos,
        query_pos,
        tgt=None,
        src_key_pad_mask=None,
        tgt_key_pad_mask=None,
        deterministic=True,
    ):
        memory = TransformerEncoder(
            self.num_encoder_layers, self.d_model, self.nheads,
            self.dim_feedforward, self.dropout, self.activation, self.pre_norm,
            name="encoder",
        )(src, src_pos, src_key_pad_mask, deterministic)
        if tgt is None:
            tgt = jnp.zeros_like(query_pos)
        hs, hs_raw = TransformerDecoder(
            self.num_decoder_layers, self.d_model, self.nheads,
            self.dim_feedforward, self.dropout, self.activation, self.pre_norm,
            True, self.track_attention, self.num_track_slots,
            self.sow_attention, name="decoder",
        )(
            tgt, memory, query_pos, src_pos, src_key_pad_mask,
            tgt_key_pad_mask, deterministic,
        )
        return hs, hs_raw, memory


class IntertwinedBranch(nn.Module):
    """One-directional cross-stream fusion (reference :470-485): src1 is
    updated from src2 —
        norm(dropout(act(concat(lin1(src1), lin2(src2)))) + src1).
    The reference also constructs a `linear2` (d/2 -> d) layer its forward
    never applies (dead weight) — not replicated here; the importer skips
    that key."""

    d_model: int
    dropout: float = 0.1
    activation: str = "relu"

    @nn.compact
    def __call__(self, src1, src2, deterministic=True):
        x1 = nn.Dense(self.d_model // 2, name="linear_input1")(src1)
        x2 = nn.Dense(self.d_model // 2, name="linear_input2")(src2)
        act = {"relu": nn.relu, "gelu": nn.gelu, "glu": nn.glu}[
            self.activation
        ]
        x = act(jnp.concatenate([x1, x2], axis=-1))
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x + src1)


class KinematicTransformer(nn.Module):
    """Single KineT stream: encoder over the detection sequence + decoder
    (reference :87-142). Returns (hs [L, B, Q, C], memory [B, N, C])."""

    d_model: int = 288
    nheads: int = 8
    num_encoder_layers: int = 1
    num_decoder_layers: int = 1
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    pre_norm: bool = False

    @nn.compact
    def __call__(
        self,
        src,
        pos,
        query_pos,
        tgt=None,
        src_key_pad_mask=None,
        tgt_key_pad_mask=None,
        deterministic=True,
    ):
        if tgt is None:
            tgt = jnp.zeros_like(query_pos)
        memory = TransformerEncoder(
            self.num_encoder_layers, self.d_model, self.nheads,
            self.dim_feedforward, self.dropout, self.activation, self.pre_norm,
            name="encoder",
        )(src, pos, src_key_pad_mask, deterministic)
        hs, hs_raw = TransformerDecoder(
            self.num_decoder_layers, self.d_model, self.nheads,
            self.dim_feedforward, self.dropout, self.activation, self.pre_norm,
            name="decoder",
        )(tgt, memory, query_pos, pos, src_key_pad_mask,
          tgt_key_pad_mask, deterministic)
        return hs, hs_raw, memory


class DualKinematicTransformer(nn.Module):
    """Two parallel enc-dec streams (boxes / metadata), fused AFTER the
    decoders by the IntertwinedBranch pair (reference :145-185): the
    detection branch is updated from the metadata stream, then the metadata
    branch from the UPDATED detection stream (reference :183-184). Fusion
    applies to the full intermediate stack (all decoder layers)."""

    d_model: int = 288
    nheads: int = 8
    num_encoder_layers: int = 1
    num_decoder_layers: int = 1
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    pre_norm: bool = False

    @nn.compact
    def __call__(
        self,
        src_det,
        src_meta,
        pos,
        query_pos_det,
        query_pos_meta,
        tgt_det=None,
        tgt_meta=None,
        src_key_pad_mask=None,
        tgt_key_pad_mask=None,
        deterministic=True,
    ):
        hs_det, _, mem_det = KinematicTransformer(
            self.d_model, self.nheads, self.num_encoder_layers,
            self.num_decoder_layers, self.dim_feedforward, self.dropout,
            self.activation, self.pre_norm, name="transformer_det",
        )(src_det, pos, query_pos_det, tgt_det, src_key_pad_mask,
          tgt_key_pad_mask, deterministic)
        hs_meta, _, mem_meta = KinematicTransformer(
            self.d_model, self.nheads, self.num_encoder_layers,
            self.num_decoder_layers, self.dim_feedforward, self.dropout,
            self.activation, self.pre_norm, name="transformer_metadata",
        )(src_meta, pos, query_pos_meta, tgt_meta, src_key_pad_mask,
          tgt_key_pad_mask, deterministic)
        hs_det = IntertwinedBranch(
            self.d_model, self.dropout, self.activation,
            name="detection_branch",
        )(hs_det, hs_meta, deterministic)
        hs_meta = IntertwinedBranch(
            self.d_model, self.dropout, self.activation,
            name="metadata_branch",
        )(hs_meta, hs_det, deterministic)
        return hs_det, hs_meta, mem_det, mem_meta


class DualKinematicEncoder(nn.Module):
    """Encoder-only KineT variant (reference :188-239): track trails are
    concatenated into the *source* sequence; predictions are read off the
    encoder output rows."""

    d_model: int = 288
    nheads: int = 8
    num_encoder_layers: int = 1
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    pre_norm: bool = False

    @nn.compact
    def __call__(
        self,
        src_det,
        src_meta,
        pos,
        src_key_pad_mask=None,
        deterministic=True,
    ):
        enc_a = TransformerEncoder(
            self.num_encoder_layers, self.d_model, self.nheads,
            self.dim_feedforward, self.dropout, self.activation, self.pre_norm,
            name="encoder_det",
        )(src_det, pos, src_key_pad_mask, deterministic)
        enc_b = TransformerEncoder(
            self.num_encoder_layers, self.d_model, self.nheads,
            self.dim_feedforward, self.dropout, self.activation, self.pre_norm,
            name="encoder_meta",
        )(src_meta, pos, src_key_pad_mask, deterministic)
        # reference :235-236: the metadata branch reads the ORIGINAL
        # (pre-fusion) detection memory, unlike the dual transformer
        fused_det = IntertwinedBranch(
            self.d_model, self.dropout, self.activation,
            name="detection_branch",
        )(enc_a, enc_b, deterministic)
        fused_meta = IntertwinedBranch(
            self.d_model, self.dropout, self.activation,
            name="metadata_branch",
        )(enc_b, enc_a, deterministic)
        return fused_det, fused_meta
