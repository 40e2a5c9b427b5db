"""Positional encodings (reference: src/trackformer/models/position_encoding.py).

Pure functions over pad masks, NHWC layout (channel-last is the natural TPU
layout; the reference emits NCHW). `pad_mask` follows the reference's
NestedTensor convention: True = padded pixel.

Variants:
- sine_position_encoding      : 2D image sine (reference :85-121)
- sine3d_position_encoding    : adds a frame axis for multi-frame attention
                                (reference :12-81); channel remainder is
                                zero-padded when hidden_dim % 3 != 0
- learned_position_encoding   : flax module (reference :124-149)
- sine_detection_encoding     : 1D detection-slot encoding capped at
                                max_detections (reference :152-184)
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


def _dim_t(num_pos_feats: int, temperature: float) -> jnp.ndarray:
    t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    return temperature ** (2.0 * jnp.floor(t / 2.0) / num_pos_feats)


def _interleave_sin_cos(pos: jnp.ndarray) -> jnp.ndarray:
    """pos [..., F] -> [..., F] with sin on even, cos on odd input slots."""
    s = jnp.sin(pos[..., 0::2])
    c = jnp.cos(pos[..., 1::2])
    return jnp.stack([s, c], axis=-1).reshape(*pos.shape[:-1], -1)


def sine_position_encoding(
    pad_mask: jnp.ndarray,
    num_pos_feats: int = 64,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float | None = None,
) -> jnp.ndarray:
    """pad_mask [B, H, W] (True = pad) -> pos [B, H, W, 2*num_pos_feats]."""
    if scale is None:
        scale = 2 * math.pi
    not_mask = (~pad_mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        eps = 1e-6
        y_embed = (y_embed - 0.5) / (y_embed[:, -1:, :] + eps) * scale
        x_embed = (x_embed - 0.5) / (x_embed[:, :, -1:] + eps) * scale
    dim_t = _dim_t(num_pos_feats, temperature)
    pos_x = _interleave_sin_cos(x_embed[..., None] / dim_t)
    pos_y = _interleave_sin_cos(y_embed[..., None] / dim_t)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def sine3d_position_encoding(
    pad_mask: jnp.ndarray,
    num_pos_feats: int,
    num_frames: int = 2,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float | None = None,
    pad_to: int | None = None,
) -> jnp.ndarray:
    """pad_mask [B, H, W] -> pos [B, num_frames, H, W, C].

    C = 3*num_pos_feats, zero-padded up to `pad_to` channels if given
    (the reference silently requires hidden_dim % 3 == 0; we pad instead).
    Frame index enters as a cumsum along the frame axis like reference :45.
    """
    if scale is None:
        scale = 2 * math.pi
    b, h, w = pad_mask.shape
    not_mask = jnp.broadcast_to(
        (~pad_mask)[:, None].astype(jnp.float32), (b, num_frames, h, w)
    )
    z_embed = jnp.cumsum(not_mask, axis=1)
    y_embed = jnp.cumsum(not_mask, axis=2)
    x_embed = jnp.cumsum(not_mask, axis=3)
    if normalize:
        eps = 1e-6
        z_embed = z_embed / (z_embed[:, -1:, :, :] + eps) * scale
        y_embed = y_embed / (y_embed[:, :, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, :, -1:] + eps) * scale
    dim_t = _dim_t(num_pos_feats, temperature)
    pos_z = _interleave_sin_cos(z_embed[..., None] / dim_t)
    pos_y = _interleave_sin_cos(y_embed[..., None] / dim_t)
    pos_x = _interleave_sin_cos(x_embed[..., None] / dim_t)
    pos = jnp.concatenate([pos_z, pos_y, pos_x], axis=-1)
    if pad_to is not None and pos.shape[-1] < pad_to:
        pad = pad_to - pos.shape[-1]
        pos = jnp.pad(pos, [(0, 0)] * (pos.ndim - 1) + [(0, pad)])
    return pos


def sine_detection_encoding(
    pad_mask: jnp.ndarray,
    num_pos_feats: int,
    temperature: float = 10000.0,
    scale: float | None = None,
    max_detections: int = 60,
) -> jnp.ndarray:
    """Detection-slot index encoding: pad_mask [B, N] -> [B, N, 2*num_pos_feats].

    Mirrors reference :167-184: cumsum over slots mod max_detections,
    dim_t uses temperature**(i/F) (not the paired variant), full sin/cos stack.
    """
    if scale is None:
        scale = 2 * math.pi
    not_mask = (~pad_mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1) % max_detections
    y_embed = (y_embed - 0.5) / max_detections * scale
    t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (t / num_pos_feats)
    pos = y_embed[..., None] / dim_t
    return jnp.stack([jnp.sin(pos), jnp.cos(pos)], axis=-1).reshape(
        *pos.shape[:-1], -1
    )


class LearnedPositionEncoding(nn.Module):
    """Learned row/col embeddings (reference :124-149), NHWC output."""

    num_pos_feats: int = 256
    max_size: int = 50

    @nn.compact
    def __call__(self, pad_mask: jnp.ndarray) -> jnp.ndarray:
        b, h, w = pad_mask.shape
        row = self.param(
            "row_embed",
            nn.initializers.uniform(scale=1.0),
            (self.max_size, self.num_pos_feats),
        )
        col = self.param(
            "col_embed",
            nn.initializers.uniform(scale=1.0),
            (self.max_size, self.num_pos_feats),
        )
        x_emb = col[:w][None, :, :]  # [1, W, F]
        y_emb = row[:h][:, None, :]  # [H, 1, F]
        pos = jnp.concatenate(
            [
                jnp.broadcast_to(x_emb, (h, w, self.num_pos_feats)),
                jnp.broadcast_to(y_emb, (h, w, self.num_pos_feats)),
            ],
            axis=-1,
        )
        return jnp.broadcast_to(pos[None], (b, h, w, 2 * self.num_pos_feats))


def build_position_encoding_fn(cfg):
    """Dispatch mirroring reference :187-214. Returns fn(pad_mask) -> pos."""
    hidden_dim = cfg.hidden_dim
    if cfg.kine:
        n_steps = hidden_dim // 2
        return lambda m: sine_detection_encoding(
            m, n_steps, max_detections=cfg.max_number_detection
        )
    if cfg.multi_frame_attention and cfg.multi_frame_encoding:
        n_steps = hidden_dim // 3
        return lambda m: sine3d_position_encoding(m, n_steps, pad_to=hidden_dim)
    n_steps = hidden_dim // 2
    if cfg.position_embedding in ("v2", "sine"):
        return lambda m: sine_position_encoding(m, n_steps, normalize=True)
    raise ValueError(f"not supported {cfg.position_embedding}")
