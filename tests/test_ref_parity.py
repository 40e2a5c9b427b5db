"""Layer-by-layer numerical parity vs the LIVE torch reference code.

Imports the reference's own modules from /root/reference/src (torchvision is
stubbed — only version/ops shims are touched at import time) and asserts our
flax rebuild + weight importer reproduce them within tolerance:

- sine position encoding  (reference models/position_encoding.py:85-121)
- full vanilla Transformer stack via import_state_dict
  (reference models/transformer.py:19-84)
- HungarianMatcher assignments, softmax + focal cost
  (reference models/matcher.py:84-202)
- SetCriterion loss values: CE/focal labels, L1+GIoU boxes, cardinality
  (reference models/detr.py:566-888)

This is the substitute for a real-checkpoint MOTA run while no MOT17 data
is mountable (VERDICT round-1 item 4); it validates the importer against
real reference module code instead of synthetic dicts.
"""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

# ---- torchvision / CUDA-ext stubs. The reference package __init__ pulls in
# backbone.py (torchvision resnets/FPN) and the compiled
# MultiScaleDeformableAttention extension at import time; neither is used by
# the modules under test (transformer/matcher/criterion/pos-enc), so stub
# just enough for the imports to resolve. ----
def _stub(name, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        mod.__path__ = []  # mark as package
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


class _StubLayer(torch.nn.Module):
    def __init__(self, *a, **k):
        super().__init__()


tv = _stub("torchvision", __version__="0.15.2")
tv.models = _stub(
    "torchvision.models",
    _utils=_stub("torchvision.models._utils", IntermediateLayerGetter=_StubLayer),
)
tv.ops = _stub(
    "torchvision.ops",
    misc=_stub("torchvision.ops.misc"),
    feature_pyramid_network=_stub(
        "torchvision.ops.feature_pyramid_network",
        FeaturePyramidNetwork=_StubLayer,
        LastLevelMaxPool=_StubLayer,
    ),
)
_stub(
    "MultiScaleDeformableAttention",
    ms_deform_attn_forward=None,
    ms_deform_attn_backward=None,
)
def _box_area(boxes):
    return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])


tv.ops.boxes = _stub("torchvision.ops.boxes", box_area=_box_area)
_stub("visdom", Visdom=object)
_stub("pycocotools")
_stub("pycocotools.coco", COCO=object)
_stub("pycocotools.cocoeval", COCOeval=object)
_stub("pycocotools.mask")

REF = "/root/reference/src"
if REF not in sys.path:
    sys.path.insert(0, REF)

torch.manual_seed(0)


def t2n(x):
    return x.detach().cpu().numpy()


# ---------------------------------------------------------------- pos enc
def test_sine_position_encoding_parity():
    from trackformer.models.position_encoding import PositionEmbeddingSine

    from kinet_tpu.models.position_encoding import sine_position_encoding

    b, h, w, c = 2, 7, 9, 64
    mask = np.zeros((b, h, w), bool)
    mask[0, 5:, :] = True  # padded rows
    mask[1, :, 6:] = True

    ref_mod = PositionEmbeddingSine(c // 2, normalize=True)

    class _NT:
        def __init__(self, m):
            self.mask = torch.from_numpy(m)
            self.tensors = torch.zeros((b, 3, h, w))

        def decompose(self):
            return self.tensors, self.mask

    ref = t2n(ref_mod(_NT(mask)))  # [B, C, H, W]
    ours = np.asarray(
        sine_position_encoding(jnp.asarray(mask), c // 2)
    )  # [B, H, W, C]
    np.testing.assert_allclose(
        ours.transpose(0, 3, 1, 2), ref, rtol=1e-5, atol=1e-5
    )


# ---------------------------------------------------------- transformer
def test_vanilla_transformer_stack_parity():
    from trackformer.models.transformer import Transformer as RefTransformer

    from kinet_tpu.models.transformer import Transformer
    from kinet_tpu.models.position_encoding import sine_position_encoding
    from kinet_tpu.tools.import_torch_weights import import_state_dict

    d, heads, layers, ff = 64, 4, 2, 128
    b, h, w, q = 2, 6, 8, 10
    ref = RefTransformer(
        d_model=d, nhead=heads, num_encoder_layers=layers,
        num_decoder_layers=layers, dim_feedforward=ff, dropout=0.0,
        normalize_before=False, return_intermediate_dec=True,
    ).eval()

    ours = Transformer(
        d_model=d, nheads=heads, num_encoder_layers=layers,
        num_decoder_layers=layers, dim_feedforward=ff, dropout=0.0,
        pre_norm=False, return_intermediate_dec=True,
    )

    rng = np.random.default_rng(0)
    src = rng.normal(size=(b, d, h, w)).astype(np.float32)
    mask = np.zeros((b, h, w), bool)
    mask[1, :, 6:] = True
    pos = np.asarray(
        sine_position_encoding(jnp.asarray(mask), d // 2)
    ).transpose(0, 3, 1, 2)  # [B, C, H, W]
    query_embed = rng.normal(size=(q, d)).astype(np.float32)

    src_flat = src.reshape(b, d, h * w).transpose(0, 2, 1)  # [B, L, D]
    pos_flat = pos.reshape(b, d, h * w).transpose(0, 2, 1)
    qe = np.broadcast_to(query_embed[None], (b, q, d)).copy()

    params = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(src_flat), jnp.asarray(pos_flat),
        jnp.asarray(qe), src_key_pad_mask=jnp.asarray(mask.reshape(b, -1)),
    )
    sd = {f"transformer.{k}": v for k, v in ref.state_dict().items()}
    tree, report = import_state_dict(
        sd, {"params": {"transformer": params["params"]}}, nheads=heads
    )
    assert not report["unmapped"], report["unmapped"]
    params = {"params": tree["params"]["transformer"]}

    hs_ours, hs_raw_ours, mem_ours = ours.apply(
        params, jnp.asarray(src_flat), jnp.asarray(pos_flat), jnp.asarray(qe),
        src_key_pad_mask=jnp.asarray(mask.reshape(b, -1)),
    )
    with torch.no_grad():
        hs_ref, hs_raw_ref, mem_ref = ref(
            torch.from_numpy(src), torch.from_numpy(mask),
            torch.from_numpy(query_embed)[:, None].repeat(1, b, 1),
            torch.from_numpy(pos),
        )
    # memory: ref [B, C, H, W] -> [B, L, C]
    mem_ref = t2n(mem_ref).reshape(b, d, h * w).transpose(0, 2, 1)
    np.testing.assert_allclose(
        np.asarray(mem_ours), mem_ref, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(hs_ours), t2n(hs_ref), rtol=1e-4, atol=1e-4
    )
    # the pre-norm stack (hs_without_norm — the hs_embed feedback source,
    # reference detr.py:135) must match too
    np.testing.assert_allclose(
        np.asarray(hs_raw_ours), t2n(hs_raw_ref), rtol=1e-4, atol=1e-4
    )


# --------------------------------------------------------------- matcher
def _rand_det_problem(seed, b=2, q=12, n_per=(3, 5), c=20, focal=False):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(b, q, c + (0 if focal else 1))).astype(np.float32)
    boxes = rng.uniform(0.2, 0.6, size=(b, q, 4)).astype(np.float32)
    tgt_list = []
    for i in range(b):
        n = n_per[i]
        tgt_list.append(
            {
                "labels": torch.from_numpy(
                    rng.integers(0, c, size=(n,)).astype(np.int64)
                ),
                "boxes": torch.from_numpy(
                    rng.uniform(0.2, 0.6, size=(n, 4)).astype(np.float32)
                ),
            }
        )
    return logits, boxes, tgt_list


def _as_targets(tgt_list, n_max):
    from kinet_tpu.structs import Targets

    b = len(tgt_list)
    boxes = np.zeros((b, n_max, 4), np.float32)
    labels = np.zeros((b, n_max), np.int32)
    valid = np.zeros((b, n_max), bool)
    for i, t in enumerate(tgt_list):
        n = len(t["labels"])
        boxes[i, :n] = t["boxes"].numpy()
        labels[i, :n] = t["labels"].numpy()
        valid[i, :n] = True
    return Targets.create(
        jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid),
        num_track_queries=0, hidden_dim=8,
    )


@pytest.mark.parametrize("focal", [False, True])
def test_hungarian_matcher_parity(focal):
    from trackformer.models.matcher import HungarianMatcher

    from kinet_tpu.models.matcher import hungarian_match

    logits, boxes, tgt_list = _rand_det_problem(1, focal=focal)
    ref_matcher = HungarianMatcher(
        cost_class=2.0, cost_bbox=5.0, cost_giou=2.0,
        focal_loss=focal, focal_alpha=0.25, focal_gamma=2.0,
    )
    with torch.no_grad():
        ref_idx = ref_matcher(
            {
                "pred_logits": torch.from_numpy(logits),
                "pred_boxes": torch.from_numpy(boxes),
            },
            tgt_list,
        )
    targets = _as_targets(tgt_list, n_max=6)
    q4t = np.asarray(
        hungarian_match(
            jnp.asarray(logits), jnp.asarray(boxes), targets,
            cost_class=2.0, cost_bbox=5.0, cost_giou=2.0,
            focal_loss=focal, focal_alpha=0.25, focal_gamma=2.0,
        )
    )
    for i, (pred_i, tgt_i) in enumerate(ref_idx):
        ref_pairs = set(zip(pred_i.tolist(), tgt_i.tolist()))
        our_pairs = {
            (int(q4t[i, t]), t)
            for t in range(len(tgt_list[i]["labels"]))
            if q4t[i, t] >= 0
        }
        assert our_pairs == ref_pairs, (i, our_pairs, ref_pairs)


# -------------------------------------------------------------- criterion
@pytest.mark.parametrize("focal", [False, True])
def test_criterion_loss_parity(focal):
    from trackformer.models.detr import SetCriterion as RefCriterion
    from trackformer.models.matcher import HungarianMatcher

    from kinet_tpu.models.criterion import SetCriterion

    c = 20
    logits, boxes, tgt_list = _rand_det_problem(2, c=c, focal=focal)
    # make sure targets exist in both images so num_boxes matches
    ref_matcher = HungarianMatcher(
        cost_class=2.0, cost_bbox=5.0, cost_giou=2.0,
        focal_loss=focal, focal_alpha=0.25, focal_gamma=2.0,
    )
    wd = {"loss_ce": 2.0, "loss_bbox": 5.0, "loss_giou": 2.0}
    ref_crit = RefCriterion(
        num_classes=c, matcher=ref_matcher, weight_dict=wd, eos_coef=0.1,
        losses=["labels", "boxes", "cardinality"],
        focal_loss=focal, focal_alpha=0.25, focal_gamma=2.0,
        tracking=False, track_query_false_positive_eos_weight=False,
    )
    with torch.no_grad():
        ref_losses = ref_crit(
            {
                "pred_logits": torch.from_numpy(logits),
                "pred_boxes": torch.from_numpy(boxes),
            },
            tgt_list,
        )

    ours = SetCriterion(
        num_classes=c, weight_dict=wd, eos_coef=0.1,
        losses=("labels", "boxes", "cardinality"),
        focal_loss=focal, focal_alpha=0.25, focal_gamma=2.0,
        cost_class=2.0, cost_bbox=5.0, cost_giou=2.0,
    )
    targets = _as_targets(tgt_list, n_max=6)
    our_losses = ours(
        {
            "pred_logits": jnp.asarray(logits),
            "pred_boxes": jnp.asarray(boxes),
            "query_valid": jnp.ones(logits.shape[:2], bool),
        },
        targets,
    )
    for key in ("loss_ce", "loss_bbox", "loss_giou", "cardinality_error"):
        assert key in our_losses, (key, sorted(our_losses))
        np.testing.assert_allclose(
            float(our_losses[key]), float(ref_losses[key]),
            rtol=1e-4, atol=1e-5, err_msg=key,
        )
