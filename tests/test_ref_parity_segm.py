"""Segmentation-head parity vs the LIVE torch reference
(MHAttentionMap + MaskHeadSmallConv, reference detr_segmentation.py:105-216)
on weights bridged by import_state_dict."""
import numpy as np

import jax
import jax.numpy as jnp

import test_ref_parity  # noqa: F401  (installs torchvision/CUDA-ext stubs)
import torch

from test_ref_parity import t2n

torch.manual_seed(0)


def test_mh_attention_map_parity():
    from trackformer.models.detr_segmentation import (
        MHAttentionMap as RefAttn,
    )

    from kinet_tpu.models.segmentation import MHAttentionMap
    from kinet_tpu.tools.import_torch_weights import import_state_dict

    d, heads, b, q, h, w = 256, 8, 2, 5, 6, 9
    ref = RefAttn(d, d, heads, dropout=0.0).eval()
    ours = MHAttentionMap(d, heads)

    rng = np.random.default_rng(0)
    qv = rng.normal(size=(b, q, d)).astype(np.float32)
    mem = rng.normal(size=(b, h, w, d)).astype(np.float32)
    mask = np.zeros((b, h, w), bool)
    mask[1, :, 7:] = True

    variables = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(qv), jnp.asarray(mem),
        jnp.asarray(mask),
    )
    sd = {f"bbox_attention.{k}": v for k, v in ref.state_dict().items()}
    new, info = import_state_dict(
        sd, {"params": {"bbox_attention": variables["params"]}}, nheads=heads
    )
    assert info["unmapped"] == [], info["unmapped"]
    params = {"params": new["params"]["bbox_attention"]}

    out = ours.apply(
        params, jnp.asarray(qv), jnp.asarray(mem), jnp.asarray(mask)
    )
    with torch.no_grad():
        r_out = ref(
            torch.from_numpy(qv),
            torch.from_numpy(mem.transpose(0, 3, 1, 2)),
            torch.from_numpy(mask),
        )
    np.testing.assert_allclose(
        np.asarray(out), t2n(r_out), rtol=1e-4, atol=1e-5
    )


def test_mask_head_small_conv_parity():
    from trackformer.models.detr_segmentation import (
        MaskHeadSmallConv as RefHead,
    )

    from kinet_tpu.models.segmentation import MaskHeadSmallConv
    from kinet_tpu.tools.import_torch_weights import import_state_dict

    # context 256: every GroupNorm width is divisible by 8 — the reference
    # hardcodes 8 groups and cannot run otherwise
    ctx, heads, b, q = 256, 8, 2, 3
    h, w = 6, 8
    dim = ctx + heads
    fpn_dims = (64, 32, 16)
    ref = RefHead(dim, fpn_dims, ctx).eval()
    ours = MaskHeadSmallConv(dim, ctx)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(b, h, w, ctx)).astype(np.float32)
    attn = rng.normal(size=(b, q, heads, h, w)).astype(np.float32)
    fpns = [
        rng.normal(size=(b, h * s, w * s, c)).astype(np.float32)
        for s, c in zip((2, 4, 8), fpn_dims)
    ]

    variables = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(attn),
        [jnp.asarray(f) for f in fpns],
    )
    sd = {f"mask_head.{k}": v for k, v in ref.state_dict().items()}
    new, info = import_state_dict(
        sd, {"params": {"mask_head": variables["params"]}}, nheads=heads
    )
    assert info["unmapped"] == [], info["unmapped"]
    params = {"params": new["params"]["mask_head"]}

    out = ours.apply(
        params, jnp.asarray(x), jnp.asarray(attn),
        [jnp.asarray(f) for f in fpns],
    )
    with torch.no_grad():
        r_out = ref(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(attn),
            [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in fpns],
        )
    # reference returns [B*Q, 1, H', W']; ours [B, Q, H', W']
    r = t2n(r_out).reshape(b, q, *t2n(r_out).shape[-2:])
    np.testing.assert_allclose(np.asarray(out), r, rtol=1e-4, atol=1e-4)
