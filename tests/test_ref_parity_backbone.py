"""ResNet-50 backbone parity vs live torch (VERDICT r2 next-step #2).

torchvision is not installed here (which is why the backbone was the one
module without a live-parity test), but the resnet50 bottleneck stack is
fully standard, documented arithmetic — so this harness builds a minimal
torch replica with torchvision's exact module naming and semantics
(v1.5 bottleneck: stride on the 3x3; replace_stride_with_dilation for
DC5), using the reference's own live FrozenBatchNorm2d
(reference models/backbone.py:22-58), generates a reference-style state
dict, bridges it through tools/import_torch_weights, and asserts forward
parity of our flax NHWC rebuild at every pyramid level — including the
row-parity space-to-depth stem rewrite (kinet_tpu/models/backbone.py
StemConv) and the DC5 dilated stage.
"""
import numpy as np

import jax
import jax.numpy as jnp

import test_ref_parity  # noqa: F401  (installs torchvision/CUDA-ext stubs)
import torch
import torch.nn as nn

from kinet_tpu.models.backbone import BackboneWithMasksAll
from kinet_tpu.tools.import_torch_weights import import_state_dict

torch.manual_seed(0)


def _frozen_bn():
    from trackformer.models.backbone import FrozenBatchNorm2d

    return FrozenBatchNorm2d


class TBottleneck(nn.Module):
    """torchvision Bottleneck (v1.5: stride on the 3x3)."""

    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 dilation=1):
        super().__init__()
        FBN = _frozen_bn()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = FBN(planes)
        self.conv2 = nn.Conv2d(
            planes, planes, 3, stride=stride, padding=dilation,
            dilation=dilation, bias=False,
        )
        self.bn2 = FBN(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = FBN(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TResNet(nn.Module):
    """Minimal torchvision-resnet50 replica returning the C2..C5 pyramid.

    Mirrors torchvision ResNet._make_layer exactly, including DC5
    (replace_stride_with_dilation=[False, False, True], reference
    backbone.py:100-108): the first block of the dilated stage keeps
    previous_dilation == 1 with stride 1; later blocks run dilation 2.
    """

    def __init__(self, layers=(3, 4, 6, 3), dilation=False):
        super().__init__()
        FBN = _frozen_bn()
        self.inplanes = 64
        self.dilation = 1
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = FBN(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0], stride=1)
        self.layer2 = self._make_layer(128, layers[1], stride=2)
        self.layer3 = self._make_layer(256, layers[2], stride=2)
        self.layer4 = self._make_layer(
            512, layers[3], stride=2, dilate=dilation
        )

    def _make_layer(self, planes, blocks, stride=1, dilate=False):
        FBN = _frozen_bn()
        previous_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                FBN(planes * 4),
            )
        layers = [
            TBottleneck(self.inplanes, planes, stride, downsample,
                        previous_dilation)
        ]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(
                TBottleneck(self.inplanes, planes, dilation=self.dilation)
            )
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return [c2, c3, c4, c5]


def _randomize(model: nn.Module, seed: int = 7):
    """Seeded, scale-sane weights + BN buffers (kaiming-ish convs, benign
    frozen-BN statistics) so 16 residual blocks stay in a comparable
    numeric range."""
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if k.endswith("running_var"):
            sd[k] = torch.rand(v.shape, generator=g) * 1.5 + 0.5
        elif k.endswith("running_mean"):
            sd[k] = torch.randn(v.shape, generator=g) * 0.3
        elif ".bn" in k and k.endswith("weight") or k.endswith("1.weight") and v.ndim == 1:
            sd[k] = torch.rand(v.shape, generator=g) * 0.6 + 0.7
        elif v.ndim == 1:  # bn biases
            sd[k] = torch.randn(v.shape, generator=g) * 0.2
        else:  # conv kernels, kaiming-normal-ish
            fan_in = v[0].numel()
            sd[k] = torch.randn(v.shape, generator=g) * (2.0 / fan_in) ** 0.5
    model.load_state_dict(sd)
    return model


def _parity_case(dilation: bool):
    tm = _randomize(TResNet(dilation=dilation)).eval()
    sd = {f"backbone.0.body.{k}": v for k, v in tm.state_dict().items()}

    x = torch.randn(1, 3, 64, 96, generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        ref_feats = tm(x)

    bb = BackboneWithMasksAll(name_arch="resnet50", dilation=dilation)
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    pad = jnp.zeros((1, 64, 96), bool)
    variables = jax.jit(bb.init)(jax.random.PRNGKey(0), x_j, pad)
    # importer writes under the full-model scope ("backbone", "trunk", ...)
    wrapped = {"params": {"backbone": variables["params"]}}
    new_vars, report = import_state_dict(sd, wrapped, strict=True)
    assert not report["unmapped"], report["unmapped"][:8]
    feats, _ = jax.jit(bb.apply)(
        {"params": new_vars["params"]["backbone"]}, x_j, pad
    )

    assert len(feats) == 4
    for lvl, (rf, jf) in enumerate(zip(ref_feats, feats)):
        r = rf.numpy().transpose(0, 2, 3, 1)
        j = np.asarray(jf)
        assert r.shape == j.shape, (lvl, r.shape, j.shape)
        scale = max(np.abs(r).max(), 1.0)
        np.testing.assert_allclose(
            j, r, rtol=1e-4, atol=1e-4 * scale,
            err_msg=f"level C{lvl + 2} (dilation={dilation})",
        )


def test_resnet50_forward_parity():
    """Full resnet50 pyramid (strides 4/8/16/32) matches the live torch
    replica at 1e-4 — covers the space-to-depth stem, frozen-BN affine,
    and all 16 bottlenecks through the weight importer."""
    _parity_case(dilation=False)


def test_resnet50_dc5_forward_parity():
    """DC5 (stride->dilation in layer4, reference backbone.py:100-108):
    C5 at stride 16 with torchvision's first-block previous_dilation
    semantics."""
    _parity_case(dilation=True)
