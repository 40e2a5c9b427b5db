"""MOTS (mask) tracker equivalence vs the LIVE torch reference.

Extends test_ref_parity_tracker.py to the segmentation path: a
DETRSegmTracking reference model and kinet_tpu's SegmWrapper tracking
model run the full mask-enabled Tracker state machine side-by-side on
bridged weights (reference detr_segmentation.py + tracker.py:515-527
per-pixel overlap resolution, PostProcessSegm :219-253).

Building this harness found TWO MORE live reference defects (patched here
with evident intent; see PARITY.md):
- DETRSegmBase.forward (detr_segmentation.py:40) accepts only
  (samples, targets) but Tracker.step always passes prev_features as a
  third positional arg (tracker.py:309) -> MOTS tracking TypeErrors.
- Tracker.add_tracks (tracker.py:100-108) passes the mask as Track's 6th
  POSITIONAL argument — which is pos_rel, not mask (Track.__init__,
  tracker.py:1059) — so new tracks keep mask=None (the attention map
  lands in mask) and the mask-resolution block crashes on torch.stack.

And two real parity bugs in the rebuild (fixed in this round):
- the mask head consumed the encoder memory instead of the PROJECTED top
  backbone feature (reference detr_segmentation.py:55-60),
- mask logits were sigmoided before bilinear resizing (reference
  PostProcessSegm interpolates logits, THEN sigmoids).

Mask comparison note: on a random-weight model the per-pixel probs sit
near 0.5 over wide bands, so boolean masks flip on 1e-5 float noise and
on argmax near-ties in the overlap resolution; the test asserts the PROB
field to 1e-3 and boolean agreement > 0.95 (id/bbox behavior is exact).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import test_ref_parity  # noqa: F401  installs torchvision/pycocotools stubs
import test_ref_parity_tracker as TRT
from test_ref_parity_backbone import TResNet, _randomize

import jax
import jax.numpy as jnp

D, HEADS, LAYERS, FF, Q, NC = 128, 8, 1, 64, 6, 20
H, W = 64, 96
T_SLOTS = 6


class _TBackboneInterm(torch.nn.Module):
    """Reference BackboneBase with return_interm_layers=True semantics
    (backbone.py:72-91) over the TResNet replica."""

    def __init__(self):
        super().__init__()
        self.body = TResNet(layers=(1, 1, 1, 1))
        self.num_channels = [256, 512, 1024, 2048]

    def forward(self, tensor_list):
        from trackformer.util.misc import NestedTensor

        feats = self.body(tensor_list.tensors)
        m = tensor_list.mask
        out = {}
        for i, x in enumerate(feats):
            mask = F.interpolate(
                m[None].float(), size=x.shape[-2:]
            ).to(torch.bool)[0]
            out[str(i)] = NestedTensor(x, mask)
        return out


def _build_ref_model(seed=7):
    from trackformer.models.backbone import Joiner
    from trackformer.models.detr_segmentation import DETRSegmTracking
    from trackformer.models.position_encoding import PositionEmbeddingSine
    from trackformer.models.transformer import Transformer as RefTransformer

    torch.manual_seed(seed)
    bw = _TBackboneInterm()
    _randomize(bw.body, seed=seed)
    joiner = Joiner(bw, PositionEmbeddingSine(D // 2, normalize=True))
    joiner.num_channels = bw.num_channels
    t = RefTransformer(
        d_model=D, nhead=HEADS, num_encoder_layers=LAYERS,
        num_decoder_layers=LAYERS, dim_feedforward=FF, dropout=0.0,
        normalize_before=False, return_intermediate_dec=True,
    )
    model = DETRSegmTracking(
        mask_kwargs=dict(freeze_detr=False),
        tracking_kwargs=dict(
            track_query_false_positive_prob=0.0,
            track_query_false_negative_prob=0.0,
            matcher=None, backprop_prev_frame=False,
        ),
        detr_kwargs=dict(
            backbone=joiner, transformer=t, num_classes=NC, num_queries=Q,
            aux_loss=False, overflow_boxes=False,
        ),
    )
    with torch.no_grad():
        model.class_embed.weight.mul_(0.0)
        model.class_embed.bias.mul_(0.0)
        torch.manual_seed(11)
        model.class_embed.weight[0].normal_(
            0.0, 4.0 / model.class_embed.in_features ** 0.5
        )
        model.class_embed.bias[0] += 3.0
        model.bbox_embed.layers[-1].weight.mul_(16.0)
        model.bbox_embed.layers[-1].bias.mul_(0.0)
    model.tracking()
    return model


def _patch_segm_ref_defects():
    from trackformer.models.detr_segmentation import DETRSegmBase
    from trackformer.models.tracker import Track as RefTrack
    from trackformer.models.tracker import Tracker as RefTracker

    if not getattr(DETRSegmBase, "_kinet_prev_patch", False):
        orig = DETRSegmBase.forward

        def _fwd_with_prev(self, samples, targets=None, prev_features=None):
            return orig(self, samples, targets)

        DETRSegmBase.forward = _fwd_with_prev
        DETRSegmBase._kinet_prev_patch = True

    def _add_tracks_fixed(self, pos, scores, hs_embeds, indices, masks=None,
                          attention_maps=None, aux_results=None):
        new_track_ids = []
        for i in range(len(pos)):
            self.tracks.append(RefTrack(
                pos[i], scores[i], self.track_num + i, hs_embeds[i],
                indices[i],
                mask=None if masks is None else masks[i],
                attention_map=(
                    None if attention_maps is None else attention_maps[i]
                ),
            ))
            new_track_ids.append(self.track_num + i)
        self.track_num += len(new_track_ids)
        return new_track_ids

    RefTracker.add_tracks = _add_tracks_fixed


@pytest.fixture(scope="module")
def segm_pair():
    from kinet_tpu.config import load_config
    from kinet_tpu.models.build import build_model
    from kinet_tpu.structs import ImageBatch, Targets
    from kinet_tpu.tools.import_torch_weights import import_state_dict

    ref_model = _build_ref_model()
    sd = ref_model.state_dict()

    cfg = load_config(
        "train.yaml", named=["train_tracking", "train_mots20"]
    ).replace(
        dataset="mot", backbone="resnet_test", hidden_dim=D, nheads=HEADS,
        enc_layers=LAYERS, dec_layers=LAYERS, dim_feedforward=FF,
        num_queries=Q, max_objects=6, max_track_queries=T_SLOTS,
        dropout=0.0, aux_loss=False, masks=True, freeze_detr=False,
    )
    model, _, _ = build_model(cfg)
    batch0 = ImageBatch(
        images=jnp.zeros((1, H, W, 3)), pad_mask=jnp.zeros((1, H, W), bool)
    )
    tg0 = Targets.create(
        jnp.zeros((1, 2, 4)), jnp.zeros((1, 2), jnp.int32),
        jnp.zeros((1, 2), bool),
        num_track_queries=T_SLOTS, hidden_dim=D,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch0, tg0)
    new_params, report = import_state_dict(sd, params, nheads=HEADS, strict=True)
    assert not report["unmapped"], report["unmapped"]
    if "params" not in new_params:
        new_params = {"params": new_params}
    return ref_model, model, new_params, batch0, tg0


def test_segm_forward_and_prob_field_parity(segm_pair):
    """Mask logits to ~3e-4, and the full interpolate->sigmoid prob field
    (= what the tracker thresholds) to 1e-3 on bridged weights."""
    from kinet_tpu.models.postprocess import postprocess as my_post
    from kinet_tpu.tracking.tracker import make_forward_fn

    ref_model, model, params, batch0, tg0 = segm_pair
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, size=(1, 3, H, W)).astype(np.float32)
    from trackformer.util.misc import NestedTensor

    nt = NestedTensor(
        torch.from_numpy(img), torch.zeros((1, H, W), dtype=torch.bool)
    )
    with torch.no_grad():
        out_r, *_ = ref_model(nt, None)
    rm = out_r["pred_masks"].numpy()
    if rm.ndim == 5:
        rm = rm.squeeze(2)

    out_m = jax.jit(model.apply)(
        params, batch0.replace(images=jnp.asarray(img.transpose(0, 2, 3, 1)))
    )
    mm = np.asarray(out_m["pred_masks"])[:, -Q:]
    np.testing.assert_allclose(mm, rm, atol=5e-3, rtol=5e-3)

    # tracker-consumed prob field (PostProcessSegm semantics: bilinear on
    # LOGITS, then sigmoid)
    rprob = torch.sigmoid(
        F.interpolate(
            torch.from_numpy(rm), size=(H, W), mode="bilinear",
            align_corners=False,
        )
    ).numpy()
    fwd = make_forward_fn(model, params, my_post)
    res = fwd(
        params, batch0.replace(images=jnp.asarray(img.transpose(0, 2, 3, 1))),
        tg0, jnp.asarray([[float(H), float(W)]]), None, None, None,
    )
    mprob = np.asarray(res["mask_probs"][0])[-Q:]
    np.testing.assert_allclose(mprob, rprob[0], atol=1e-3, rtol=0)


def test_segm_tracker_state_machine_equivalence(segm_pair):
    from trackformer.models.detr import PostProcess as RefPostProcess
    from trackformer.models.detr_segmentation import (
        PostProcessSegm as RefPPSegm,
    )
    from trackformer.models.tracker import Tracker as RefTracker

    from kinet_tpu.models.postprocess import postprocess as my_post
    from kinet_tpu.tracking.tracker import Tracker as MyTracker

    ref_model, model, params, _, _ = segm_pair
    TRT._patch_ref_defects()
    _patch_segm_ref_defects()

    cfg = dict(
        detection_obj_score_thresh=0.45, track_obj_score_thresh=0.75,
        detection_nms_thresh=0.5, track_nms_thresh=0.6,
        public_detections=False, inactive_patience=4,
        reid_sim_threshold=20.0, reid_sim_only=False, reid_score_thresh=0.60,
        reid_greedy_matching=False, prev_frame_dist=1, steps_termination=1,
    )
    ref_tracker = RefTracker(
        ref_model, {"bbox": RefPostProcess(), "segm": RefPPSegm()}, cfg,
        generate_attention_maps=False,
    )
    ref_tracker.reset()
    my_tracker = MyTracker(
        model, params, my_post, cfg,
        num_object_queries=Q, num_track_slots=T_SLOTS, hidden_dim=D,
    )

    rng = np.random.default_rng(42)
    frames = [
        rng.uniform(0, 1, size=(1, 3, H, W)).astype(np.float32)
        for _ in range(8)
    ]
    for f, img in enumerate(frames):
        blob_ref = {
            "img": torch.from_numpy(img),
            "orig_size": torch.tensor([[H, W]], dtype=torch.long),
            "size": torch.tensor([[H, W]], dtype=torch.long),
            "dets": [torch.zeros((0, 4))],
        }
        with torch.no_grad():
            ref_tracker.step(blob_ref)
        blob_my = {
            "images": img.transpose(0, 2, 3, 1),
            "pad_mask": np.zeros((1, H, W), bool),
            "orig_size": (H, W),
            "dets": np.zeros((0, 4), np.float32),
        }
        my_tracker.step(blob_my)
        rids = sorted(t.id for t in ref_tracker.tracks)
        mids = sorted(t.id for t in my_tracker.tracks)
        assert rids == mids, (f, rids, mids)

    res_r, res_m = ref_tracker.get_results(), my_tracker.get_results()
    assert sorted(res_r) == sorted(res_m)
    n_masks = 0
    for tid in res_r:
        for f in res_r[tid]:
            r, m = res_r[tid][f], res_m[tid][f]
            np.testing.assert_allclose(
                m["bbox"], r["bbox"], atol=5e-2, rtol=0
            )
            if "mask" in r:
                assert "mask" in m, (tid, f)
                rmask = np.asarray(r["mask"]).squeeze().astype(bool)
                mmask = np.asarray(m["mask"]).squeeze().astype(bool)
                assert rmask.shape == mmask.shape
                agree = (rmask == mmask).mean()
                n_masks += 1
                # near-0.5 prob bands + argmax near-ties flip on float
                # noise for a random model (see module docstring); the
                # prob FIELD is asserted at 1e-3 in the forward test
                assert agree > 0.95, (tid, f, agree)
    assert n_masks >= 8  # the scenario must actually produce masks
