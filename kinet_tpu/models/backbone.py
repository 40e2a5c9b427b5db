"""Backbones (reference: src/trackformer/models/backbone.py).

- ResNet-50/101 in flax.linen, NHWC, with FrozenBatchNorm semantics
  (reference :22-58): BN statistics and affine are fixed parameters, the
  whole BN is a per-channel scale+shift — trivially fusible by XLA.
- Returns the C2..C5 pyramid (strides 4/8/16/32, channels 256/512/1024/2048,
  reference :72-81) with per-level pad masks (reference :83-91).
- DC5: stride→dilation in the last stage (reference :100-108).
- Kinet_Backbone: the detection/metadata MLP "backbones" (reference :111-221).

Freezing conv1+layer1 (reference :62-70) is an optimizer concern here —
see engine.param_labels — not a model concern.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """BatchNorm with all four buffers as inert params (reference :22-58)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        f = self.features
        weight = self.param("weight", nn.initializers.ones, (f,))
        bias = self.param("bias", nn.initializers.zeros, (f,))
        mean = self.param("running_mean", nn.initializers.zeros, (f,))
        var = self.param("running_var", nn.initializers.ones, (f,))
        scale = weight * jax.lax.rsqrt(var + self.eps)
        return x * scale + (bias - mean * scale)


class StemConv(nn.Module):
    """The ResNet 7x7/s2 stem conv, computed as a 4x4/s1 conv on a
    space-to-depth(2) input — an exact rewrite.

    Why: with 3 input channels the MXU runs the direct 7x7 conv at
    ~4 TFLOP/s (1.45 ms/frame at 800px, the single biggest backbone op);
    the transformed conv sees 12 input channels at a quarter of the
    spatial size. The parameter keeps the reference [7,7,3,64] layout
    (reference models/backbone.py:72-81 / torchvision conv1) so
    checkpoint import and the torch-weight converter are unchanged.

    Derivation: out[i,j] = sum_{ky,kx} W[ky,kx] * Xpad[2i+ky, 2j+kx] with
    pad 3. Split ky = 2a+dy (dy in {0,1}): 2i+ky = 2(i+a)+dy, so gathering
    pixel parity into channels (space-to-depth) turns the stride-2 7x7
    into a stride-1 4x4 over (dy, dx, c) channels, where kernel tap
    (a, b, dy, dx) reads W[2a+dy, 2b+dx] (zero for index 7).
    """

    features: int = 64

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, x.shape[-1], self.features),
        )
        b, h, hw, c = x.shape
        w = w.astype(x.dtype)
        # kernel [7,7,C,O] -> [4,7,(2,C)=2C,O]: pad row taps to 8, split
        # ROW parity only. (Full 2x2 space-to-depth is exact too, but every
        # way of materializing the W-parity fold — 6-d reshape+transpose or
        # stride-2 lane slices — relayouts the whole image through the
        # 3-channel minor dim and costs more than the conv saves. Row
        # slices move whole sublanes and are cheap.)
        w8 = jnp.pad(w, ((0, 1), (0, 0), (0, 0), (0, 0)))
        k2 = w8.reshape(4, 2, 7, c, self.features).transpose(0, 2, 1, 3, 4)
        k2 = k2.reshape(4, 7, 2 * c, self.features)
        xp = jnp.pad(x, ((0, 0), (3, 3 + h % 2), (3, 3), (0, 0)))
        x2 = jnp.concatenate([xp[:, 0::2], xp[:, 1::2]], axis=-1)
        return jax.lax.conv_general_dilated(
            x2, k2, window_strides=(1, 2), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class Bottleneck(nn.Module):
    """torchvision-style ResNet v1.5 bottleneck (stride on the 3x3)."""

    features: int  # bottleneck width; output is 4x this
    stride: int = 1
    dilation: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = FrozenBatchNorm(self.features, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(self.dilation, self.dilation)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            name="conv2",
        )(y)
        y = FrozenBatchNorm(self.features, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = FrozenBatchNorm(self.features * 4, name="bn3")(y)
        if self.downsample:
            identity = nn.Conv(
                self.features * 4,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(self.features * 4, name="downsample_bn")(
                identity
            )
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """ResNet-50/101 trunk returning the {layer1..layer4} pyramid."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # resnet50; 101 = (3,4,23,3)
    dilation: bool = False  # DC5

    @nn.compact
    def __call__(self, x):
        x = StemConv(64, name="conv1")(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feats = []
        widths = (64, 128, 256, 512)
        for stage, (blocks, width) in enumerate(zip(self.stage_sizes, widths)):
            last = stage == len(self.stage_sizes) - 1
            dil = 2 if (self.dilation and last) else 1
            stride = 1 if stage == 0 or (self.dilation and last) else 2
            for b in range(blocks):
                x = Bottleneck(
                    width,
                    stride=stride if b == 0 else 1,
                    # torchvision replace_stride_with_dilation semantics
                    # (ref backbone.py:100-108): the FIRST block of the
                    # dilated stage keeps previous_dilation == 1; only the
                    # remaining blocks run dilation 2
                    dilation=1 if b == 0 else dil,
                    downsample=(b == 0),
                    name=f"layer{stage + 1}_{b}",
                )(x)
            feats.append(x)
        return feats  # [C2, C3, C4, C5]


def downsample_pad_mask(pad_mask: jnp.ndarray, hw: tuple[int, int]) -> jnp.ndarray:
    """Resize a [B, H, W] bool pad mask to feature resolution (reference :83-91
    uses nearest interpolation; identical semantics here)."""
    b = pad_mask.shape[0]
    out = jax.image.resize(
        pad_mask.astype(jnp.float32), (b, hw[0], hw[1]), method="nearest"
    )
    return out > 0.5


class Backbone(nn.Module):
    """ResNet + per-level masks; which levels are exposed matches the
    reference's return_interm_layers logic (backbone.py:72-81)."""

    name_arch: str = "resnet50"
    return_interm_layers: bool = True
    dilation: bool = False

    def setup(self):
        sizes = {
            "resnet50": (3, 4, 6, 3),
            "resnet101": (3, 4, 23, 3),
            # 1-block-per-stage trunk for fast CI compiles (not in reference)
            "resnet_test": (1, 1, 1, 1),
        }
        self.trunk = ResNet(
            stage_sizes=sizes[self.name_arch], dilation=self.dilation
        )

    def __call__(self, images: jnp.ndarray, pad_mask: jnp.ndarray):
        feats = self.trunk(images)
        if self.return_interm_layers:
            # strides 8, 16, 32 — reference deformable uses layers 2..4
            # (backbone.py:74-77: {layer2,layer3,layer4} for deformable,
            #  all four incl. layer1 for masks)
            feats = feats[1:] if len(feats) == 4 else feats
        else:
            feats = feats[-1:]
        masks = [
            downsample_pad_mask(pad_mask, (f.shape[1], f.shape[2])) for f in feats
        ]
        return feats, masks

    @property
    def num_channels(self):
        if self.return_interm_layers:
            return [512, 1024, 2048]
        return [2048]


class BackboneWithMasksAll(Backbone):
    """All four levels (used by the segmentation head)."""

    def __call__(self, images, pad_mask):
        feats = self.trunk(images)
        masks = [
            downsample_pad_mask(pad_mask, (f.shape[1], f.shape[2])) for f in feats
        ]
        return feats, masks


class LayerBackboneFC(nn.Module):
    """3-linear MLP + LayerNorm over detection vectors (reference :111-125).

    Exact reference dataflow: the single activation sits after linear2 —
        norm(linear3(dropout(act(linear2(dropout(linear1(x)))))))
    (no activation after linear1 or linear3)."""

    hidden_dim: int
    dropout: float = 0.1
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, deterministic=True):
        act = {"relu": nn.relu, "gelu": nn.gelu, "glu": nn.glu}[
            self.activation
        ]
        x = nn.Dense(self.hidden_dim, name="linear1")(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = act(nn.Dense(self.hidden_dim, name="linear2")(x))
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.hidden_dim, name="linear3")(x)
        # torch nn.LayerNorm eps (1e-5; flax defaults to 1e-6)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class KinetBackbone(nn.Module):
    """Dual MLP backbone for (detections, metadata) (reference :145-221).

    Input dims: detections 4 (or sine-encoded dim), metadata 1-2 depending
    on use_class; both project to hidden_dim.
    """

    hidden_dim: int
    dropout: float = 0.1
    activation: str = "relu"

    @nn.compact
    def __call__(
        self, detections: jnp.ndarray, metadata: jnp.ndarray,
        deterministic: bool = True,
    ):
        det = LayerBackboneFC(
            self.hidden_dim, self.dropout, self.activation,
            name="det_backbone",
        )(detections, deterministic)
        meta = LayerBackboneFC(
            self.hidden_dim, self.dropout, self.activation,
            name="meta_backbone",
        )(metadata, deterministic)
        return det, meta
