"""Parity vs the LIVE torch reference for the remaining pure-tensor
surfaces: 3D (multi-frame) sine encoding, tracklet trail encoding, both
PostProcess variants, generalized box IoU, and the encoder-only KineT
fusion core."""
import numpy as np

import jax
import jax.numpy as jnp

import test_ref_parity  # noqa: F401  (installs torchvision/CUDA-ext stubs)
import torch

from test_ref_parity import t2n

torch.manual_seed(0)


def test_sine3d_position_encoding_parity():
    from trackformer.models.position_encoding import PositionEmbeddingSine3D
    from trackformer.util.misc import NestedTensor

    from kinet_tpu.models.position_encoding import sine3d_position_encoding

    b, h, w, f = 2, 7, 9, 8
    mask = np.zeros((b, h, w), bool)
    mask[1, 5:, :] = True
    ref = PositionEmbeddingSine3D(f, num_frames=2, normalize=True)
    r = t2n(
        ref(NestedTensor(torch.zeros(b, 3, h, w), torch.from_numpy(mask)))
    )  # [B, frames, C, H, W]
    ours = np.asarray(
        sine3d_position_encoding(jnp.asarray(mask), f, num_frames=2)
    )  # [B, frames, H, W, C]
    np.testing.assert_allclose(
        ours.transpose(0, 1, 4, 2, 3), r, rtol=1e-5, atol=1e-5
    )


def test_sine_trail_encoding_parity():
    from trackformer.models.detr_tracking import SineEncodingTracklet

    from kinet_tpu.tracking.kine_augment import sine_encode_trail

    n, t, f = 3, 5, 16
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(n, t, 4)).astype(np.float32)
    ref = SineEncodingTracklet(f)
    r = t2n(ref(torch.from_numpy(x)))  # [N, T*4*F]
    ours = np.asarray(sine_encode_trail(jnp.asarray(x), f)).reshape(n, -1)
    np.testing.assert_allclose(ours, r, rtol=1e-5, atol=1e-5)


def _random_outputs(b, q, nc, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(b, q, nc)).astype(np.float32)
    boxes = rng.uniform(0.1, 0.6, size=(b, q, 4)).astype(np.float32)
    sizes = np.array([[480.0, 640.0], [300.0, 400.0]], np.float32)
    return logits, boxes, sizes


def test_postprocess_softmax_parity():
    from trackformer.models.detr import PostProcess

    from kinet_tpu.models.postprocess import postprocess

    logits, boxes, sizes = _random_outputs(2, 7, 21)
    ref = PostProcess()
    with torch.no_grad():
        r = ref(
            {"pred_logits": torch.from_numpy(logits),
             "pred_boxes": torch.from_numpy(boxes)},
            torch.from_numpy(sizes),
        )
    ours = postprocess(
        {"pred_logits": jnp.asarray(logits), "pred_boxes": jnp.asarray(boxes)},
        jnp.asarray(sizes),
    )
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(ours["scores"][i]), t2n(r[i]["scores"]), rtol=1e-5,
            atol=1e-6,
        )
        assert (np.asarray(ours["labels"][i]) == t2n(r[i]["labels"])).all()
        np.testing.assert_allclose(
            np.asarray(ours["boxes"][i]), t2n(r[i]["boxes"]), rtol=1e-4,
            atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(ours["scores_no_object"][i]),
            t2n(r[i]["scores_no_object"]), rtol=1e-5, atol=1e-6,
        )


def test_postprocess_sigmoid_parity():
    from trackformer.models.deformable_detr import DeformablePostProcess

    from kinet_tpu.models.postprocess import postprocess_focal

    logits, boxes, sizes = _random_outputs(2, 7, 20, seed=1)
    ref = DeformablePostProcess()
    with torch.no_grad():
        r = ref(
            {"pred_logits": torch.from_numpy(logits),
             "pred_boxes": torch.from_numpy(boxes)},
            torch.from_numpy(sizes),
        )
    ours = postprocess_focal(
        {"pred_logits": jnp.asarray(logits), "pred_boxes": jnp.asarray(boxes)},
        jnp.asarray(sizes),
    )
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(ours["scores"][i]), t2n(r[i]["scores"]), rtol=1e-5,
            atol=1e-6,
        )
        assert (np.asarray(ours["labels"][i]) == t2n(r[i]["labels"])).all()
        np.testing.assert_allclose(
            np.asarray(ours["boxes"][i]), t2n(r[i]["boxes"]), rtol=1e-4,
            atol=1e-3,
        )


def test_generalized_box_iou_parity():
    from trackformer.util import box_ops as ref_ops

    from kinet_tpu.ops import boxes as our_ops

    rng = np.random.default_rng(2)
    a = rng.uniform(0, 0.5, size=(7, 4)).astype(np.float32)
    b = rng.uniform(0, 0.5, size=(5, 4)).astype(np.float32)
    a[:, 2:] += a[:, :2] + 0.05  # valid xyxy
    b[:, 2:] += b[:, :2] + 0.05
    r = t2n(ref_ops.generalized_box_iou(torch.from_numpy(a), torch.from_numpy(b)))
    ours = np.asarray(our_ops.generalized_box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, r, rtol=1e-5, atol=1e-6)
    r_iou = t2n(ref_ops.box_iou(torch.from_numpy(a), torch.from_numpy(b))[0])
    o_iou = np.asarray(our_ops.box_iou(jnp.asarray(a), jnp.asarray(b))[0])
    np.testing.assert_allclose(o_iou, r_iou, rtol=1e-5, atol=1e-6)


def test_dual_kinematic_encoder_parity():
    """Encoder-only KineT core (reference transformer.py:188-239): two
    encoders + IntertwinedBranch pair, the metadata branch fusing from the
    ORIGINAL detection memory."""
    from trackformer.models.transformer import (
        DualKinematicEncoder as RefEnc,
    )

    from kinet_tpu.models.transformer import DualKinematicEncoder

    d, heads, ff = 32, 2, 64
    b, n = 2, 7
    ref = RefEnc(
        d_model=d, nhead=heads, num_encoder_layers=1, dim_feedforward=ff,
        dropout=0.0, normalize_before=False,
    ).eval()
    ours = DualKinematicEncoder(
        d_model=d, nheads=heads, num_encoder_layers=1, dim_feedforward=ff,
        dropout=0.0, pre_norm=False,
    )

    rng = np.random.default_rng(3)
    src_det = rng.normal(size=(b, n, d)).astype(np.float32)
    src_meta = rng.normal(size=(b, n, d)).astype(np.float32)
    pos = rng.normal(size=(b, n, d)).astype(np.float32)
    mask = np.zeros((b, n), bool)
    mask[1, 5:] = True

    variables = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(src_det), jnp.asarray(src_meta),
        jnp.asarray(pos),
    )
    # stream names (encoder_det/encoder_meta) have no generic importer
    # mapping; bridge the handful of tensors by hand
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    ref_sd = {k: t2n(v) for k, v in ref.state_dict().items()}

    def mha(prefix_t, prefix_f):
        w = ref_sd[f"{prefix_t}.in_proj_weight"]
        bq, bk, bv = np.split(ref_sd[f"{prefix_t}.in_proj_bias"], 3)
        wq, wk, wv = np.split(w, 3, axis=0)
        hd = d // heads
        tgt = p
        for part in prefix_f.split("/"):
            tgt = tgt[part]
        for name, wm, bm in (("query", wq, bq), ("key", wk, bk), ("value", wv, bv)):
            tgt[name]["kernel"] = wm.T.reshape(d, heads, hd)
            tgt[name]["bias"] = bm.reshape(heads, hd)
        tgt["out"]["kernel"] = ref_sd[f"{prefix_t}.out_proj.weight"].T.reshape(
            heads, hd, d
        )
        tgt["out"]["bias"] = ref_sd[f"{prefix_t}.out_proj.bias"]

    def lin(path_t, tgt):
        tgt["kernel"] = ref_sd[f"{path_t}.weight"].T
        tgt["bias"] = ref_sd[f"{path_t}.bias"]

    def norm(path_t, tgt):
        tgt["scale"] = ref_sd[f"{path_t}.weight"]
        tgt["bias"] = ref_sd[f"{path_t}.bias"]

    for stream, fl in (("encoder_det", "encoder_det"), ("encoder_meta", "encoder_meta")):
        lay = p[fl]["layer0"]
        mha(f"{stream}.layers.0.self_attn", f"{fl}/layer0/_SelfAttnBlock_0/MultiHeadDotProductAttention_0")
        lin(f"{stream}.layers.0.linear1", lay["Dense_0"])
        lin(f"{stream}.layers.0.linear2", lay["Dense_1"])
        norm(f"{stream}.layers.0.norm1", lay["LayerNorm_0"])
        norm(f"{stream}.layers.0.norm2", lay["LayerNorm_1"])
    for branch in ("detection_branch", "metadata_branch"):
        lin(f"{branch}.linear_input1", p[branch]["linear_input1"])
        lin(f"{branch}.linear_input2", p[branch]["linear_input2"])
        norm(f"{branch}.norm", p[branch]["norm"])

    out_det, out_meta = ours.apply(
        {"params": p}, jnp.asarray(src_det), jnp.asarray(src_meta),
        jnp.asarray(pos), src_key_pad_mask=jnp.asarray(mask),
    )
    with torch.no_grad():
        r_det, r_meta, _, _ = ref(
            torch.from_numpy(src_det), torch.from_numpy(src_meta),
            torch.from_numpy(mask),
            pos_boxes=torch.from_numpy(pos),
            pos_metadata=torch.from_numpy(pos),
        )
    # reference returns [1, B?, ...]: hs_det = memory.transpose(0,1)[None]
    np.testing.assert_allclose(
        np.asarray(out_det), t2n(r_det)[0], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_meta), t2n(r_meta)[0], rtol=1e-4, atol=1e-4
    )


def test_mask_loss_parity():
    """dice + sigmoid-focal mask losses (reference util/misc.py:616-665)."""
    from trackformer.util.misc import (
        dice_loss as ref_dice,
        sigmoid_focal_loss as ref_focal,
    )

    from kinet_tpu.models.criterion import dice_loss, sigmoid_focal_loss

    rng = np.random.default_rng(4)
    n, hw = 6, 64
    logits = rng.normal(size=(n, hw)).astype(np.float32)
    targets = (rng.uniform(size=(n, hw)) > 0.6).astype(np.float32)
    num_boxes = 4.0

    r_dice = float(ref_dice(
        torch.from_numpy(logits), torch.from_numpy(targets), num_boxes
    ))
    o_dice = float(dice_loss(
        jnp.asarray(logits), jnp.asarray(targets), num_boxes,
        jnp.ones((n,), bool),
    ))
    np.testing.assert_allclose(o_dice, r_dice, rtol=1e-5)

    r_focal = float(ref_focal(
        torch.from_numpy(logits), torch.from_numpy(targets), num_boxes
    ))
    # ours returns the elementwise loss; reference reduces mean(1).sum()/nb
    o_focal = float(
        jnp.sum(jnp.mean(
            sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets)),
            axis=1,
        )) / num_boxes
    )
    np.testing.assert_allclose(o_focal, r_focal, rtol=1e-5)


def test_basic_box_matcher_parity():
    """KineT detection-GT matcher (reference BasicBoxHungarianMatcher,
    matcher.py:13-81): same LSAP assignment on the same boxes (cost weights
    differ by a common factor — the argmin is invariant)."""
    from trackformer.models.matcher import BasicBoxHungarianMatcher

    from kinet_tpu.models.matcher import box_match

    rng = np.random.default_rng(5)
    n_det, n_gt = 8, 5
    dets = rng.uniform(0.2, 0.8, size=(n_det, 5)).astype(np.float32)
    dets[:, 2:4] = rng.uniform(0.05, 0.2, size=(n_det, 2))
    gt = rng.uniform(0.2, 0.8, size=(n_gt, 4)).astype(np.float32)
    gt[:, 2:] = rng.uniform(0.05, 0.2, size=(n_gt, 2))

    ref = BasicBoxHungarianMatcher(cost_class=1, cost_bbox=2, cost_giou=2)
    t_idx, d_idx = ref(
        torch.from_numpy(dets),
        {"labels": torch.zeros(n_gt, dtype=torch.long),
         "boxes": torch.from_numpy(gt)},
    )
    det4gt = np.asarray(box_match(
        jnp.asarray(dets[None, :, :4]), jnp.ones((1, n_det), bool),
        jnp.asarray(gt[None]), jnp.ones((1, n_gt), bool),
    ))[0]
    for t, d in zip(t2n(t_idx), t2n(d_idx)):
        assert det4gt[t] == d, (det4gt, t2n(t_idx), t2n(d_idx))
