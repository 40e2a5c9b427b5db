"""End-to-end slice: tiny DETR forward + matcher + criterion + one grad step.

Mirrors the role of the reference's empirical validation (SURVEY §4): no
golden numbers exist upstream, so we assert structural and semantic
invariants (shapes, masking, loss finiteness, gradient flow, matcher
constraint satisfaction).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kinet_tpu.config import load_config
from kinet_tpu.models.build import build_model
from kinet_tpu.structs import ImageBatch, Targets


def tiny_cfg(**over):
    cfg = load_config("train.yaml")
    return cfg.replace(
        dataset="mot",
        backbone="resnet_test",
        hidden_dim=32,
        nheads=2,
        enc_layers=1,
        dec_layers=2,
        dim_feedforward=64,
        num_queries=12,
        max_objects=5,
        max_track_queries=4,
        dropout=0.0,
        **over,
    )


def make_batch(key, b=2, h=64, w=96, n=5, hidden=32, t=0):
    k1, k2 = jax.random.split(key)
    images = jax.random.normal(k1, (b, h, w, 3), jnp.float32)
    pad = jnp.zeros((b, h, w), bool).at[:, h - 8 :, :].set(True)
    boxes = jax.random.uniform(k2, (b, n, 4), minval=0.2, maxval=0.5)
    labels = jnp.zeros((b, n), jnp.int32)
    valid = jnp.ones((b, n), bool).at[:, 3:].set(False)
    targets = Targets.create(
        boxes, labels, valid, num_track_queries=t, hidden_dim=hidden
    )
    return ImageBatch(images=images, pad_mask=pad), targets


def test_detr_forward_and_loss_and_grad():
    cfg = tiny_cfg()
    model, criterion, post = build_model(cfg)
    batch, targets = make_batch(jax.random.PRNGKey(0))
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch, targets)

    def loss_fn(p):
        out = model.apply(p, batch, targets)
        losses = criterion(out, targets)
        return criterion.total_loss(losses), losses

    # jit the whole value_and_grad: eager autodiff dispatches op-by-op on
    # CPU (~137 s for this graph); compiled it is seconds and the compile
    # persists in the suite's compilation cache
    (total, losses), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(params)
    assert jnp.isfinite(total)
    for k in ("loss_ce", "loss_bbox", "loss_giou", "cardinality_error"):
        assert k in losses and jnp.isfinite(losses[k]), k
    # aux losses exist per non-final decoder layer
    assert "loss_ce_0" in losses
    # some gradient reaches the backbone and the heads
    flat = jax.tree_util.tree_leaves(grads)
    gnorm = sum(jnp.sum(jnp.abs(g)) for g in flat)
    assert gnorm > 0


def test_detr_outputs_shapes():
    cfg = tiny_cfg()
    model, _, post = build_model(cfg)
    batch, targets = make_batch(jax.random.PRNGKey(0))
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch, targets)
    out = jax.jit(model.apply)(params, batch, targets)
    assert out["pred_logits"].shape == (2, 12, 21)  # 20 classes + eos
    assert out["pred_boxes"].shape == (2, 12, 4)
    assert out["hs_embed"].shape == (2, 12, 32)
    assert (out["pred_boxes"] >= 0).all() and (out["pred_boxes"] <= 1).all()
    from kinet_tpu.models.postprocess import postprocess

    sizes = jnp.array([[64.0, 96.0], [64.0, 96.0]])
    res = postprocess(out, sizes)
    assert res["boxes"].shape == (2, 12, 4)
    assert (res["scores"] >= 0).all() and (res["scores"] <= 1).all()


def test_track_query_slots_and_matcher_pinning():
    cfg = tiny_cfg(tracking=True)
    model, criterion, _ = build_model(cfg)
    t = 4
    batch, targets = make_batch(jax.random.PRNGKey(0), t=t)
    # activate 2 track slots: slot0 -> target 1 (TP), slot1 = FP
    targets = targets.replace(
        track_query_embeds=jax.random.normal(jax.random.PRNGKey(2), (2, t, 32)),
        track_query_mask=jnp.array([[True, True, False, False]] * 2),
        track_query_fp_mask=jnp.array([[False, True, False, False]] * 2),
        track_query_match_ids=jnp.array([[1, -1, -1, -1]] * 2, jnp.int32),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch, targets)
    out = jax.jit(model.apply)(params, batch, targets)
    # total queries = track slots + object queries
    assert out["pred_logits"].shape[1] == t + 12
    # inactive slots are marked invalid
    np.testing.assert_array_equal(
        np.asarray(out["query_valid"][:, :t]),
        [[True, True, False, False]] * 2,
    )
    q4t = criterion.match(out, targets)
    # target 1 must be pinned to query slot 0 (the TP track query)
    assert (np.asarray(q4t[:, 1]) == 0).all()
    # no target may match the FP slot (query 1) or inactive slots (2, 3)
    assert not np.isin(np.asarray(q4t), [1, 2, 3]).any()
    # invalid targets unmatched
    assert (np.asarray(q4t[:, 3:]) == -1).all()

    losses = criterion(out, targets)
    assert jnp.isfinite(criterion.total_loss(losses))


def test_focal_loss_variant():
    cfg = tiny_cfg(focal_loss=True)
    model, criterion, _ = build_model(cfg)
    batch, targets = make_batch(jax.random.PRNGKey(0))
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch, targets)
    out = jax.jit(model.apply)(params, batch, targets)
    assert out["pred_logits"].shape == (2, 12, 20)  # no eos column
    losses = criterion(out, targets)
    assert jnp.isfinite(criterion.total_loss(losses))


def test_kinet_forward():
    from kinet_tpu.structs import KineBatch

    cfg = tiny_cfg(kine=True, max_number_detection=8)
    model, criterion, _ = build_model(cfg)
    b, n = 2, 8
    dets = jax.random.uniform(jax.random.PRNGKey(0), (b, n, 4))
    meta = jax.random.uniform(jax.random.PRNGKey(1), (b, n, 2))
    pad = jnp.zeros((b, n), bool).at[:, 6:].set(True)
    kb = KineBatch(detections=dets, metadata=meta, pad_mask=pad)
    _, targets = make_batch(jax.random.PRNGKey(2))
    params = jax.jit(model.init)(jax.random.PRNGKey(3), kb, targets)
    out = jax.jit(model.apply)(params, kb, targets)
    assert out["pred_logits"].shape == (2, 12, 21)
    losses = criterion(out, targets)
    assert jnp.isfinite(criterion.total_loss(losses))


def test_stem_conv_space_to_depth_exact():
    """StemConv (7x7/s2 as 4x4/s1 on space-to-depth input — the MXU-fit
    stem) must match the direct strided conv bit-for-bit up to float
    noise, including odd spatial sizes."""
    import flax.linen as nn
    import numpy as np

    from kinet_tpu.models.backbone import StemConv

    for h, w in [(64, 96), (33, 47), (10, 10)]:
        x = jax.random.normal(jax.random.PRNGKey(0), (2, h, w, 3))
        stem = StemConv(64)
        params = stem.init(jax.random.PRNGKey(1), x)
        ref = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False,
        )
        out_new = stem.apply(params, x)
        out_ref = ref.apply(
            {"params": {"kernel": params["params"]["kernel"]}}, x
        )
        assert out_new.shape == out_ref.shape
        np.testing.assert_allclose(
            np.asarray(out_new), np.asarray(out_ref), atol=2e-5
        )
