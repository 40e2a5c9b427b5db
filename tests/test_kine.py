"""KineT pipeline tests: kinematic data utils, trail augmentation,
encoder-only model + ordered matcher training slice."""
import jax
import jax.numpy as jnp
import numpy as np

from kinet_tpu.config import load_config
from kinet_tpu.data.kinematic import (
    collate_kine,
    get_tracklet_data,
    normalize_kine,
    sine_encode,
)
from kinet_tpu.models.build import build_model
from kinet_tpu.structs import KineBatch, Targets
from kinet_tpu.tracking.kine_augment import (
    add_kine_track_queries,
    kine_track_embed_dims,
    sine_encode_trail,
)


def test_tracklet_data_defaults_to_current_box():
    boxes = np.array([[10, 10, 20, 20], [30, 30, 40, 40]], np.float32)
    tids = np.array([5, 7])
    prev = [
        [{"track_id": 5, "bbox": [8, 8, 10, 10]}],  # only track 5 in past
        [],
    ]
    trails = get_tracklet_data(boxes, tids, prev, trail_len=2)
    assert trails.shape == (2, 2, 4)
    np.testing.assert_allclose(trails[0, 0], [8, 8, 18, 18])  # xywh -> xyxy
    np.testing.assert_allclose(trails[0, 1], boxes[1])  # absent -> current
    np.testing.assert_allclose(trails[1, 0], boxes[0])


def test_sine_encode_parity_np_jax():
    x = np.random.default_rng(0).uniform(0, 1, (3, 4)).astype(np.float32)
    a = sine_encode(x, 8)
    b = np.asarray(sine_encode_trail(jnp.asarray(x), 8))
    np.testing.assert_allclose(a, b, atol=1e-5)


def _kine_setup(b=2, n=4, nd=6, t=6, l=3, enc=4):
    rng = np.random.default_rng(0)
    trails = rng.uniform(0.2, 0.8, (b, n, l, 4)).astype(np.float32)
    dets = rng.uniform(0.2, 0.8, (b, nd, 4)).astype(np.float32)
    meta = rng.uniform(0.5, 1.0, (b, nd, 1)).astype(np.float32)
    det_valid = np.ones((b, nd), bool)
    boxes = trails[:, :, -1, :].copy()
    targets = Targets.create(
        boxes, np.zeros((b, n), np.int32), np.ones((b, n), bool),
        np.arange(n)[None].repeat(b, 0).astype(np.int32),
        num_track_queries=t, hidden_dim=l * 4 * enc + l,
    )
    return targets, jnp.asarray(trails), jnp.asarray(dets), jnp.asarray(meta), jnp.asarray(det_valid)


def test_kine_augment_fills_slots():
    targets, trails, dets, meta, det_valid = _kine_setup()
    out = add_kine_track_queries(
        jax.random.PRNGKey(0), targets, trails, dets, meta, det_valid,
        trail_enc_dim=4, ratio_add_tracklets=1.0,
    )
    out_np = jax.tree_util.tree_map(np.asarray, out)
    # 4 targets -> 4 slots active, none FP
    assert out_np.track_query_mask.sum(axis=1).tolist() == [4, 4]
    assert out_np.track_query_fp_mask.sum() == 0
    # match ids form a permutation of targets
    for b in range(2):
        active = out_np.track_query_mask[b]
        assert sorted(out_np.track_query_match_ids[b][active].tolist()) == [0, 1, 2, 3]
    tdim, mdim = kine_track_embed_dims(3, 4, 1)
    assert out_np.track_query_embeds.shape[-1] == tdim + mdim


def test_kine_augment_fp_slots_when_few_targets():
    targets, trails, dets, meta, det_valid = _kine_setup()
    targets = targets.replace(
        valid=jnp.asarray([[True, True, False, False]] * 2)
    )
    # ratio 2.0 -> slots beyond real targets become synthetic FPs
    out = add_kine_track_queries(
        jax.random.PRNGKey(1), targets, trails, dets, meta, det_valid,
        trail_enc_dim=4, ratio_add_tracklets=2.0,
    )
    out_np = jax.tree_util.tree_map(np.asarray, out)
    assert (out_np.track_query_fp_mask.sum(axis=1) > 0).all()
    # FP slots have no match id
    assert (out_np.track_query_match_ids[out_np.track_query_fp_mask] == -1).all()


def test_kine2_training_slice():
    """Encoder-only model + ordered matcher: loss + grad in one jit."""
    l, enc = 3, 4
    cfg = load_config("train.yaml", named=["train_kinet2"]).replace(
        dataset="mot_kine", hidden_dim=32, nheads=2, dim_feedforward=32,
        dropout=0.0, max_number_detection=6, max_track_queries=6,
        track_prev_frame_range=l, encoding_dim_tracklets=enc, use_encoding_tracklets=True,
        tracking=True, aux_loss=False,
    )
    model, criterion, _ = build_model(cfg)
    assert criterion.matcher_kind == "ordered_encoder"

    targets, trails, dets, meta, det_valid = _kine_setup(l=l, enc=enc)
    kb = KineBatch(detections=dets, metadata=meta, pad_mask=~det_valid)

    @jax.jit
    def step(rng):
        aug = add_kine_track_queries(
            rng, targets, trails, dets, meta, det_valid, trail_enc_dim=enc
        )
        params = jax.jit(model.init)(jax.random.PRNGKey(0), kb, aug)

        def loss_fn(p):
            out = model.apply(p, kb, aug)
            losses = criterion(out, aug)
            return criterion.total_loss(losses), losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        gnorm = sum(jnp.sum(jnp.abs(g)) for g in jax.tree_util.tree_leaves(grads))
        return total, gnorm, losses

    total, gnorm, losses = step(jax.random.PRNGKey(3))
    assert jnp.isfinite(total) and gnorm > 0
    assert "loss_ce" in losses


def test_kine_dual_stream_forward_and_loss():
    """KinematicDetectorTransformer (used_ordered_queries path) with trail
    track queries."""
    l, enc = 3, 4
    cfg = load_config("train.yaml", named=["train_kinet"]).replace(
        dataset="mot_kine", used_ordered_queries=True, use_encoder_only=False,
        hidden_dim=32, nheads=2, dim_feedforward=32, num_queries=8,
        dropout=0.0, max_number_detection=6, max_track_queries=6,
        track_prev_frame_range=l, encoding_dim_tracklets=enc, use_encoding_tracklets=True,
        tracking=True, aux_loss=False,
    )
    model, criterion, _ = build_model(cfg)
    assert type(model).__name__ == "KinematicDetectorTransformer"

    targets, trails, dets, meta, det_valid = _kine_setup(l=l, enc=enc)
    kb = KineBatch(detections=dets, metadata=meta, pad_mask=~det_valid)
    aug = add_kine_track_queries(
        jax.random.PRNGKey(0), targets, trails, dets, meta, det_valid,
        trail_enc_dim=enc,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(1), kb, aug)
    out = jax.jit(model.apply)(params, kb, aug)
    # rows = track slots + object queries
    assert out["pred_logits"].shape[1] == 6 + 8
    losses = criterion(out, aug)
    total = criterion.total_loss(losses)
    assert jnp.isfinite(total)

    def loss_fn(p):
        o = model.apply(p, kb, aug)
        return criterion.total_loss(criterion(o, aug))

    g = jax.jit(jax.grad(loss_fn))(params)
    gnorm = sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g))
    assert jnp.isfinite(gnorm) and gnorm > 0


def test_kine_raw_trails_default_path():
    """use_encoding_tracklets=False (the reference's default,
    cfgs/train_kinet.yaml): RAW 4-number-per-frame trails flow through the
    augmentation, the dual-stream model and the criterion."""
    l = 3
    cfg = load_config("train.yaml", named=["train_kinet"]).replace(
        dataset="mot_kine", hidden_dim=32, nheads=2, dim_feedforward=32,
        num_queries=8, dropout=0.0, max_number_detection=6,
        max_track_queries=6, track_prev_frame_range=l, tracking=True,
        aux_loss=False,
    )
    assert not cfg.use_encoding_tracklets
    model, criterion, _ = build_model(cfg)
    assert type(model).__name__ == "KinematicDetectorTransformer"
    assert model.trail_enc_dim == l * 4  # raw width

    targets, trails, dets, meta, det_valid = _kine_setup(l=l, enc=4)
    e_dim = l * 4 + l * 1
    targets = targets.replace(
        track_query_embeds=jnp.zeros(
            (targets.boxes.shape[0], 6, e_dim), jnp.float32
        )
    )
    kb = KineBatch(detections=dets, metadata=meta, pad_mask=~det_valid)
    aug = add_kine_track_queries(
        jax.random.PRNGKey(0), targets, trails, dets, meta, det_valid,
        trail_enc_dim=0,  # raw
    )
    assert aug.track_query_embeds.shape[-1] == e_dim
    params = jax.jit(model.init)(jax.random.PRNGKey(1), kb, aug)
    out = jax.jit(model.apply)(params, kb, aug)
    losses = criterion(out, aug)
    assert jnp.isfinite(criterion.total_loss(losses))
