"""KineT dual-stream parity vs the LIVE torch reference.

Imports the reference's own modules from /root/reference/src (stubs come
from test_ref_parity) and asserts that our flax KineT stack + the
import_state_dict weight bridge reproduce the reference forward to 1e-4:

- Kinet_Backbone / LayerBackboneFC (reference backbone.py:111-167)
- PositionEmbeddingSineDetections (reference position_encoding.py:152-184)
- DualKinematicTransformer incl. IntertwinedBranch fusion order
  (reference transformer.py:87-185, 470-485)
- full KinematicDetectorTransformer forward, no track queries
  (reference detr.py:288-425)

The track-query path is excluded on purpose: reference detr.py:395
concatenates `query_embed_det` into the METADATA query embedding (an
evident copy-paste defect, documented in PARITY.md) — we implement the
intended per-stream embeds instead.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import test_ref_parity  # noqa: F401  (installs torchvision/CUDA stubs)
import torch

from test_ref_parity import t2n

torch.manual_seed(0)


def test_kinet_backbone_parity():
    from trackformer.models.backbone import Kinet_Backbone
    from trackformer.util.misc import NestedTensor

    from kinet_tpu.models.backbone import KinetBackbone

    d = 32
    ref_det = Kinet_Backbone(4, hidden_dims=[256, 512, d]).eval()
    ref_meta = Kinet_Backbone(1, hidden_dims=[16, 64, d]).eval()

    ours = KinetBackbone(d, dropout=0.0)
    b, n = 2, 7
    rng = np.random.default_rng(0)
    dets = rng.normal(size=(b, n, 4)).astype(np.float32)
    meta = rng.normal(size=(b, n, 1)).astype(np.float32)
    mask = np.zeros((b, n), bool)

    sd = {}
    for stream, mod in (("det", ref_det), ("metadata", ref_meta)):
        for k, v in mod.state_dict().items():
            sd[f"backbone_{stream}.0.{k}"] = v
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(dets), jnp.asarray(meta))
    # importer expects the kinet_backbone scope of the full model; wrap
    from kinet_tpu.tools.import_torch_weights import import_state_dict

    wrapped = {"params": {"kinet_backbone": params["params"]}}
    new, info = import_state_dict(sd, wrapped, nheads=2)
    assert info["applied"] == 16, info  # 2 streams x (3 linears + norm) x 2
    params = {"params": new["params"]["kinet_backbone"]}

    out_det, out_meta = ours.apply(
        params, jnp.asarray(dets), jnp.asarray(meta)
    )
    ref_out_det = ref_det(NestedTensor(torch.from_numpy(dets), torch.from_numpy(mask)))
    ref_out_meta = ref_meta(NestedTensor(torch.from_numpy(meta), torch.from_numpy(mask)))
    np.testing.assert_allclose(
        np.asarray(out_det), t2n(ref_out_det["0"].tensors), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_meta), t2n(ref_out_meta["0"].tensors), rtol=1e-4, atol=1e-5
    )


def test_sine_detection_encoding_parity():
    from trackformer.models.position_encoding import (
        PositionEmbeddingSineDetections,
    )
    from trackformer.util.misc import NestedTensor

    from kinet_tpu.models.position_encoding import sine_detection_encoding

    b, n, f = 2, 9, 16
    mask = np.zeros((b, n), bool)
    mask[1, 6:] = True
    x = np.zeros((b, n, 4), np.float32)
    ref = PositionEmbeddingSineDetections(f, max_detections=8)
    ref_out = t2n(ref(NestedTensor(torch.from_numpy(x), torch.from_numpy(mask))))
    ours = np.asarray(
        sine_detection_encoding(jnp.asarray(mask), f, max_detections=8)
    )
    np.testing.assert_allclose(ours, ref_out, rtol=1e-5, atol=1e-5)


def _ref_dual_transformer(d, heads, ff):
    from trackformer.models.transformer import DualKinematicTransformer

    return DualKinematicTransformer(
        d_model=d, nhead=heads, num_encoder_layers=1, num_decoder_layers=1,
        dim_feedforward=ff, dropout=0.0, normalize_before=False,
        return_intermediate_dec=True,
    ).eval()


def test_dual_kinematic_transformer_parity():
    from kinet_tpu.models.transformer import DualKinematicTransformer

    d, heads, ff = 32, 2, 64
    b, n, q = 2, 7, 5
    ref = _ref_dual_transformer(d, heads, ff)
    ours = DualKinematicTransformer(
        d_model=d, nheads=heads, num_encoder_layers=1, num_decoder_layers=1,
        dim_feedforward=ff, dropout=0.0, pre_norm=False,
    )

    rng = np.random.default_rng(1)
    src_det = rng.normal(size=(b, n, d)).astype(np.float32)
    src_meta = rng.normal(size=(b, n, d)).astype(np.float32)
    pos = rng.normal(size=(b, n, d)).astype(np.float32)
    qe_det = rng.normal(size=(q, d)).astype(np.float32)
    qe_meta = rng.normal(size=(q, d)).astype(np.float32)
    mask = np.zeros((b, n), bool)
    mask[1, 5:] = True

    qp_det = jnp.broadcast_to(jnp.asarray(qe_det)[None], (b, q, d))
    qp_meta = jnp.broadcast_to(jnp.asarray(qe_meta)[None], (b, q, d))
    from kinet_tpu.tools.import_torch_weights import import_state_dict

    raw = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(src_det), jnp.asarray(src_meta),
        jnp.asarray(pos), qp_det, qp_meta,
    )
    # importer addresses the full-model layout; wrap under its scope
    wrapped = {"params": {"transformer": raw["params"]}}
    sd = {f"transformer.{k}": v for k, v in ref.state_dict().items()}
    new, info = import_state_dict(sd, wrapped, nheads=heads)
    params = {"params": new["params"]["transformer"]}
    # every reference tensor except the dead IntertwinedBranch linear2
    dead = [k for k in info["unmapped"] if ".linear2." in k and "branch" in k]
    assert len(info["unmapped"]) == len(dead), info["unmapped"]

    hs_det, hs_meta, _, _ = ours.apply(
        params, jnp.asarray(src_det), jnp.asarray(src_meta), jnp.asarray(pos),
        qp_det, qp_meta, src_key_pad_mask=jnp.asarray(mask),
    )

    t_qe_det = torch.from_numpy(qe_det)[:, None].repeat(1, b, 1)
    t_qe_meta = torch.from_numpy(qe_meta)[:, None].repeat(1, b, 1)
    with torch.no_grad():
        r_det, r_meta, _, _ = ref(
            torch.from_numpy(src_det), torch.from_numpy(src_meta),
            torch.from_numpy(mask), t_qe_det, t_qe_meta, None, None,
            pos_boxes=torch.from_numpy(pos), pos_metadata=torch.from_numpy(pos),
        )
    np.testing.assert_allclose(
        np.asarray(hs_det), t2n(r_det), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(hs_meta), t2n(r_meta), rtol=1e-4, atol=1e-4
    )


def test_kinet_dual_model_parity():
    """Full dual-stream KineT forward on identical weights, no track
    queries (reference detr.py:337-417 with targets=None)."""
    from trackformer.models.backbone import Joiner, Kinet_Backbone
    from trackformer.models.detr import (
        KinematicDetectorTransformer as RefModel,
    )
    from trackformer.models.position_encoding import (
        PositionEmbeddingSineDetections,
    )
    from trackformer.util.misc import NestedTensor

    from kinet_tpu.models.detr import KinematicDetectorTransformer
    from kinet_tpu.structs import KineBatch, Targets

    d, heads, ff, q, nc = 32, 2, 64, 5, 20
    maxdet = 8

    pos_enc = PositionEmbeddingSineDetections(d // 2, max_detections=maxdet)
    back_det = Joiner(Kinet_Backbone(4, [256, 512, d]), pos_enc)
    back_meta = Joiner(Kinet_Backbone(1, [16, 64, d]), pos_enc)
    ref = RefModel(
        [back_det, back_meta], _ref_dual_transformer(d, heads, ff),
        num_classes=nc, num_queries=q,
    ).eval()

    ours = KinematicDetectorTransformer(
        num_classes=nc, hidden_dim=d, num_queries=q, nheads=heads,
        enc_layers=1, dec_layers=1, dim_feedforward=ff, dropout=0.0,
        aux_loss=False, num_track_slots=0, max_detections=maxdet,
        focal_loss=False,
    )

    b, n = 2, 7
    rng = np.random.default_rng(2)
    dets = rng.normal(size=(b, n, 4)).astype(np.float32)
    meta = rng.normal(size=(b, n, 1)).astype(np.float32)
    mask = np.zeros((b, n), bool)
    mask[1, 5:] = True

    kb = KineBatch(
        detections=jnp.asarray(dets), metadata=jnp.asarray(meta),
        pad_mask=jnp.asarray(mask),
    )
    params = ours.init(jax.random.PRNGKey(0), kb)

    sd = dict(ref.state_dict())
    from kinet_tpu.tools.import_torch_weights import import_state_dict

    new, info = import_state_dict(sd, params, nheads=heads)
    dead = [k for k in info["unmapped"] if ".linear2." in k and "branch" in k]
    assert len(info["unmapped"]) == len(dead), info["unmapped"]

    out = ours.apply(new, kb)

    class _Samples:
        detections = NestedTensor(torch.from_numpy(dets), torch.from_numpy(mask))
        metadata = NestedTensor(torch.from_numpy(meta), torch.from_numpy(mask))

    with torch.no_grad():
        ref_out, *_ = ref(_Samples())
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), t2n(ref_out["pred_logits"]),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_boxes"]), t2n(ref_out["pred_boxes"]),
        rtol=1e-4, atol=1e-4,
    )
