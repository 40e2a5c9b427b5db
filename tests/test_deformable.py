"""Deformable DETR tests: shapes, box refine, two-stage, multi-frame,
track-query reference points, criterion integration."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kinet_tpu.config import load_config
from kinet_tpu.models.build import build_model
from kinet_tpu.structs import ImageBatch, Targets


def dcfg(**over):
    cfg = load_config("train.yaml", named=["train_deformable"])
    base = dict(
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
        num_feature_levels=4,
        dec_n_points=2,
        enc_n_points=2,
    )
    base.update(over)
    return cfg.replace(**base)


def make_batch(key, b=2, h=64, w=96, n=5, hidden=32, t=0):
    k1, k2 = jax.random.split(key)
    images = jax.random.normal(k1, (b, h, w, 3), jnp.float32)
    pad = jnp.zeros((b, h, w), bool).at[:, h - 16 :, :].set(True)
    boxes = jax.random.uniform(k2, (b, n, 4), minval=0.2, maxval=0.5)
    labels = jnp.zeros((b, n), jnp.int32)
    valid = jnp.ones((b, n), bool).at[:, 3:].set(False)
    targets = Targets.create(
        boxes, labels, valid, num_track_queries=t, hidden_dim=hidden
    )
    return ImageBatch(images=images, pad_mask=pad), targets


def test_deformable_forward_refine_and_loss():
    cfg = dcfg(with_box_refine=True)
    model, criterion, _ = build_model(cfg)
    batch, targets = make_batch(jax.random.PRNGKey(0))
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch, targets)
    out = jax.jit(model.apply)(params, batch, targets)
    assert out["pred_logits"].shape == (2, 12, 20)  # focal: no eos col
    assert out["pred_boxes"].shape == (2, 12, 4)
    assert (out["pred_boxes"] >= 0).all() and (out["pred_boxes"] <= 1).all()
    losses = criterion(out, targets)
    assert jnp.isfinite(criterion.total_loss(losses))

    def loss_fn(p):
        o = model.apply(p, batch, targets)
        return criterion.total_loss(criterion(o, targets))

    g = jax.jit(jax.grad(loss_fn))(params)
    gnorm = sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g))
    assert jnp.isfinite(gnorm) and gnorm > 0


def test_deformable_two_stage():
    cfg = dcfg(two_stage=True, with_box_refine=True)
    model, criterion, _ = build_model(cfg)
    batch, targets = make_batch(jax.random.PRNGKey(0), h=48, w=64)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch, targets)
    out = jax.jit(model.apply)(params, batch, targets)
    assert "enc_outputs" in out
    enc = out["enc_outputs"]
    assert enc["pred_logits"].shape[1] == enc["pred_boxes"].shape[1]
    assert bool(jnp.isfinite(enc["pred_logits"]).all())
    losses = criterion(out, targets)
    assert "loss_ce_enc" in losses
    assert jnp.isfinite(criterion.total_loss(losses))


def test_cache_prev_encoder_matches_recompute():
    """Oracle for the encoded-memory cache (cache_prev_encoder): feeding
    last frame's out["frame_memory"] as prev_memory must give exactly what
    re-encoding the prev frame's features gives (the frame-agnostic encoder
    makes the two paths compute the same values)."""
    cfg = dcfg(
        tracking=True,
        multi_frame_attention=True,
        multi_frame_encoding=True,
        with_box_refine=True,
        hidden_dim=36,
        cache_prev_encoder=True,
    )
    model, _, _ = build_model(cfg)
    t = 4
    batch, targets = make_batch(jax.random.PRNGKey(0), hidden=36, t=t)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch, targets)
    prev_batch, _ = make_batch(jax.random.PRNGKey(7), hidden=36, t=t)

    fwd = jax.jit(model.apply)
    fwd_pf = jax.jit(
        lambda p, b, tg, pf: model.apply(p, b, tg, prev_features=pf)
    )
    fwd_pm = jax.jit(
        lambda p, b, tg, pm: model.apply(p, b, tg, prev_memory=pm)
    )

    # first frame: the prev:=cur alias path equals explicitly passing the
    # current frame's own features as prev_features
    out_first = fwd(params, prev_batch, targets)
    out_first_full = fwd_pf(
        params, prev_batch, targets, out_first["frame_features"]
    )
    np.testing.assert_allclose(
        np.asarray(out_first["pred_boxes"]),
        np.asarray(out_first_full["pred_boxes"]),
        atol=1e-5,
    )

    # subsequent frame: cached memory vs full re-encode of prev features
    out_cached = fwd_pm(params, batch, targets, out_first["frame_memory"])
    out_recomp = fwd_pf(params, batch, targets, out_first["frame_features"])
    for k in ("pred_logits", "pred_boxes", "hs_embed"):
        np.testing.assert_allclose(
            np.asarray(out_cached[k]), np.asarray(out_recomp[k]),
            atol=1e-5, err_msg=k,
        )
    # and the chained memory keeps matching one more frame out
    out_cached2 = fwd_pm(
        params, prev_batch, targets, out_cached["frame_memory"]
    )
    out_recomp2 = fwd_pf(
        params, prev_batch, targets, out_recomp["frame_features"]
    )
    np.testing.assert_allclose(
        np.asarray(out_cached2["pred_boxes"]),
        np.asarray(out_recomp2["pred_boxes"]),
        atol=1e-5,
    )

    # pos_cache: reusing the first frame's sine embeddings (pad mask is
    # fixed across a sequence) must be bit-equivalent to recomputing them
    fwd_pm_pc = jax.jit(
        lambda p, b, tg, pm, pc: model.apply(
            p, b, tg, prev_memory=pm, pos_cache=pc
        )
    )
    out_pc = fwd_pm_pc(
        params, batch, targets, out_first["frame_memory"],
        out_first["pos_cache"],
    )
    for k in ("pred_logits", "pred_boxes", "hs_embed"):
        np.testing.assert_allclose(
            np.asarray(out_pc[k]), np.asarray(out_cached[k]),
            atol=0, err_msg=k,
        )


def test_deformable_multi_frame_track_queries():
    cfg = dcfg(
        tracking=True,
        multi_frame_attention=True,
        multi_frame_encoding=True,
        with_box_refine=True,
        hidden_dim=36,  # divisible by 3 heads groups for 3D encoding + GN
    )
    model, criterion, _ = build_model(cfg)
    t = 4
    batch, targets = make_batch(jax.random.PRNGKey(0), hidden=36, t=t)
    targets = targets.replace(
        track_query_embeds=jax.random.normal(jax.random.PRNGKey(2), (2, t, 36)),
        track_query_boxes=jnp.full((2, t, 4), 0.4),
        track_query_mask=jnp.array([[True, True, False, False]] * 2),
        track_query_fp_mask=jnp.array([[False, True, False, False]] * 2),
        track_query_match_ids=jnp.array([[1, -1, -1, -1]] * 2, jnp.int32),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch, targets)
    prev_batch, _ = make_batch(jax.random.PRNGKey(7), hidden=36, t=t)
    prev_out = jax.jit(model.apply)(params, prev_batch, None)
    out = jax.jit(
        lambda p, b, tg, pf: model.apply(p, b, tg, prev_features=pf)
    )(params, batch, targets, prev_out["frame_features"])
    assert out["pred_logits"].shape[1] == t + 12
    np.testing.assert_array_equal(
        np.asarray(out["query_valid"][:, :t]), [[True, True, False, False]] * 2
    )
    q4t = criterion.match(out, targets)
    assert (np.asarray(q4t[:, 1]) == 0).all()  # pinned to TP slot
    losses = criterion(out, targets)
    assert jnp.isfinite(criterion.total_loss(losses))


def test_msda_gather_raw_matches_project_first():
    """gather-then-project (decoder fast path) must match the standard
    project-then-gather MSDeformAttn on identical params — exact by
    linearity (fp32; only summation order differs)."""
    from kinet_tpu.models.deformable_transformer import MSDeformAttn

    b, lq, c, m = 2, 7, 32, 4
    shapes = ((6, 9), (3, 5))
    s = sum(h * w for h, w in shapes)
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    query = jax.random.normal(k1, (b, lq, c))
    src = jax.random.normal(k2, (b, s, c))
    ref = jax.random.uniform(k3, (b, lq, len(shapes), 2), minval=0.05, maxval=0.95)
    pad = jnp.zeros((b, s), bool).at[:, -4:].set(True)

    std = MSDeformAttn(c, len(shapes), m, 3, gather_raw=False)
    raw = MSDeformAttn(c, len(shapes), m, 3, gather_raw=True)
    params = std.init(jax.random.PRNGKey(1), query, ref, src, shapes, pad)
    out_std = std.apply(params, query, ref, src, shapes, pad)
    out_raw = raw.apply(params, query, ref, src, shapes, pad)
    np.testing.assert_allclose(
        np.asarray(out_raw), np.asarray(out_std), rtol=1e-4, atol=1e-4
    )


def test_msda_gather_raw_exact_at_pad_boundary():
    """Advisor round-2 high finding: gather-then-project must stay exact
    when sampling points land on PADDED rows. The exact path zeroes the
    projected value INCLUDING the value_proj bias at padded positions;
    the raw path restores the bias via the pooled weight sum, so that sum
    must exclude pad-hitting corners. Reproduces the reported mismatch
    (bias=5, refs spanning the pad boundary) with a realistic bottom/right
    rectangular pad mask, as produced by downsample_pad_mask."""
    from kinet_tpu.models.deformable_transformer import MSDeformAttn

    b, lq, c, m = 2, 64, 32, 4
    shapes = ((8, 10), (4, 5))
    s = sum(h * w for h, w in shapes)
    # valid region [0:vh, 0:vw] per level, per batch element
    valid = [((6, 7), (3, 4)), ((8, 10), (4, 5))]  # elem 1: no padding
    pad = np.ones((b, s), bool)
    for bi in range(b):
        cur = 0
        for (h, w), (vh, vw) in zip(shapes, valid[bi]):
            m2 = np.ones((h, w), bool)
            m2[:vh, :vw] = False
            pad[bi, cur : cur + h * w] = m2.reshape(-1)
            cur += h * w
    pad = jnp.asarray(pad)

    k = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(k, 3)
    query = jax.random.normal(k1, (b, lq, c))
    src = jax.random.normal(k2, (b, s, c))
    # refs across the full unit square — many samples straddle or land
    # inside the padded region of element 0
    ref = jax.random.uniform(
        k3, (b, lq, len(shapes), 2), minval=0.02, maxval=0.98
    )

    std = MSDeformAttn(c, len(shapes), m, 3, gather_raw=False)
    raw = MSDeformAttn(c, len(shapes), m, 3, gather_raw=True)
    params = std.init(jax.random.PRNGKey(1), query, ref, src, shapes, pad)
    # large value_proj bias — the term the weight sum restores
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: jnp.full_like(x, 5.0)
        if "value_proj" in jax.tree_util.keystr(p) and "bias" in jax.tree_util.keystr(p)
        else x,
        params,
    )
    out_std = std.apply(params, query, ref, src, shapes, pad)
    out_raw = raw.apply(params, query, ref, src, shapes, pad)
    np.testing.assert_allclose(
        np.asarray(out_raw), np.asarray(out_std), rtol=1e-4, atol=1e-4
    )


def test_dec_msda_int8_close_to_exact():
    """int8 decoder quad tables (dec_msda_int8, VERDICT r2 next #8):
    inference-only, lossy-gated. The quantized forward must stay CLOSE to
    the exact gather_raw forward (symmetric int8, per-half scalar scale
    folded into the pooling weights), including through the cached
    prev-memory path where the prev half carries its own frame's scale."""
    import warnings

    base = dcfg(
        dec_gather_raw=True, multi_frame_attention=True,
        multi_frame_encoding=True, cache_prev_encoder=True,
        frame_agnostic_levels=True, num_feature_levels=8,
    )
    model_f, _, _ = build_model(base)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        model_q, _, _ = build_model(
            base.replace(dec_msda_int8=True, allow_lossy=True)
        )
    batch, targets = make_batch(jax.random.PRNGKey(0))
    params = jax.jit(model_f.init)(jax.random.PRNGKey(1), batch, targets)

    out_f = jax.jit(model_f.apply)(params, batch, targets)
    out_q = jax.jit(model_q.apply)(params, batch, targets)
    db = float(jnp.max(jnp.abs(out_q["pred_boxes"] - out_f["pred_boxes"])))
    assert db < 0.05, db  # quantization noise, not structural error
    # boxes should be MUCH closer than random outputs would be
    assert db < 0.5 * float(jnp.std(out_f["pred_boxes"]))

    # cached path: frame 2 consumes frame 1's int8 quad half + its scale
    def two_frames(model):
        o1 = jax.jit(model.apply)(params, batch, targets)
        return jax.jit(
            lambda p, b_, t_, pm, pc: model.apply(
                p, b_, t_, prev_memory=pm, pos_cache=pc
            )
        )(params, batch, targets, o1["frame_memory"], o1["pos_cache"])

    o2f = two_frames(model_f)
    o2q = two_frames(model_q)
    db2 = float(jnp.max(jnp.abs(o2q["pred_boxes"] - o2f["pred_boxes"])))
    assert db2 < 0.05, db2

    # cache-kind guard: an exact-model cache (plain array) fed to the int8
    # path — or an int8 tuple cache fed to the exact path — must raise at
    # trace time, not silently truncate the table to garbage
    import pytest

    o1f, o1q = jax.jit(model_f.apply)(params, batch, targets), None
    with pytest.raises(ValueError, match="cache kind"):
        model_q.apply(
            params, batch, targets,
            prev_memory=o1f["frame_memory"], pos_cache=o1f["pos_cache"],
        )
    o1q = jax.jit(model_q.apply)(params, batch, targets)
    with pytest.raises(ValueError, match="cache kind"):
        model_f.apply(
            params, batch, targets,
            prev_memory=o1q["frame_memory"], pos_cache=o1q["pos_cache"],
        )


def test_enc_lite_high_klevels():
    """High-level (interleaved) encoder updates restricted to the k finest
    sampled levels (enc_lite_high_klevels): the offset/attention heads of
    the high-level layers shrink (fewer levels), forward + grads stay
    finite, and the restriction changes the function (vs enc_lite alone)."""
    base = dcfg(enc_lite=True, enc_layers=3)
    restr = base.replace(enc_lite_high_klevels=2)
    batch, targets = make_batch(jax.random.PRNGKey(0))

    m0, crit, _ = build_model(base)
    m1, _, _ = build_model(restr)
    p0 = jax.jit(m0.init)(jax.random.PRNGKey(1), batch, targets)
    p1 = jax.jit(m1.init)(jax.random.PRNGKey(1), batch, targets)
    n0 = sum(x.size for x in jax.tree_util.tree_leaves(p0))
    n1 = sum(x.size for x in jax.tree_util.tree_leaves(p1))
    assert n1 < n0  # smaller sampling heads on the high-level layers

    out = jax.jit(m1.apply)(p1, batch, targets)
    assert bool(jnp.isfinite(out["pred_boxes"]).all())

    def loss_fn(p):
        o = m1.apply(p, batch, targets)
        return crit.total_loss(crit(o, targets))

    g = jax.jit(jax.grad(loss_fn))(p1)
    gnorm = sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g))
    assert jnp.isfinite(gnorm) and gnorm > 0


def test_dec_klevels_decoder_ignores_coarse_levels():
    """dec_klevels=k: the decoder cross-attn must sample ONLY the k finest
    levels of each frame. Oracle: in the cached-prev-memory path the prev
    half of the token sequence feeds NOTHING but the decoder, so perturbing
    its dropped (coarse) levels must leave the outputs bit-identical —
    while the unrestricted model must see the perturbation."""
    base = dict(
        tracking=True,
        multi_frame_attention=True,
        multi_frame_encoding=True,
        with_box_refine=True,
        cache_prev_encoder=True,
        dec_gather_raw=True,
        hidden_dim=36,
    )
    batch, targets = make_batch(jax.random.PRNGKey(0), hidden=36, t=4)

    def two_frame_delta(dec_klevels):
        cfg = dcfg(dec_klevels=dec_klevels, **base)
        model, _, _ = build_model(cfg)
        params = jax.jit(model.init)(jax.random.PRNGKey(1), batch, targets)
        out1 = jax.jit(model.apply)(params, batch, targets)
        mem, pad = out1["frame_memory"][0], out1["frame_memory"][1]
        # levels at 64x96: (8,12)+(4,6)+(2,3)+(1,2) -> 96+24+6+2 = 128
        assert mem.shape[1] == 128
        fwd = jax.jit(
            lambda p, b_, t_, pm: model.apply(p, b_, t_, prev_memory=pm)
        )
        # perturb the prev half's two COARSEST levels (last 8 tokens);
        # pass the 2-tuple so the prev decoder table is rebuilt from the
        # (perturbed) memory rather than taken from the cache
        mem_p = mem.at[:, -8:].add(3.0)
        a = fwd(params, batch, targets, (mem, pad))
        b_ = fwd(params, batch, targets, (mem_p, pad))
        return float(
            jnp.max(jnp.abs(a["pred_boxes"] - b_["pred_boxes"]))
        ), float(jnp.max(jnp.abs(a["hs_embed"] - b_["hs_embed"])))

    d_boxes_r, d_hs_r = two_frame_delta(2)
    assert d_boxes_r == 0.0 and d_hs_r == 0.0, (d_boxes_r, d_hs_r)
    d_boxes_f, d_hs_f = two_frame_delta(0)
    assert d_hs_f > 0.0, "unrestricted decoder must see the perturbation"


def test_dec_klevels_train_and_single_frame():
    """dec_klevels on the training (non-cached) multi-frame path and on a
    single-frame model: params shrink (fewer per-level decoder sampling
    heads), forward + grads finite."""
    base = dcfg(
        tracking=True,
        multi_frame_attention=True,
        multi_frame_encoding=True,
        with_box_refine=True,
    )
    restr = base.replace(dec_klevels=2)
    batch, targets = make_batch(jax.random.PRNGKey(0), t=4)

    m0, crit, _ = build_model(base)
    m1, _, _ = build_model(restr)
    p0 = jax.jit(m0.init)(jax.random.PRNGKey(1), batch, targets)
    p1 = jax.jit(m1.init)(jax.random.PRNGKey(1), batch, targets)
    n0 = sum(x.size for x in jax.tree_util.tree_leaves(p0))
    n1 = sum(x.size for x in jax.tree_util.tree_leaves(p1))
    assert n1 < n0  # smaller decoder offset/attention heads

    def loss_fn(p):
        o = m1.apply(p, batch, targets, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
        return crit.total_loss(crit(o, targets))

    g = jax.jit(jax.grad(loss_fn))(p1)
    gnorm = sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g))
    assert jnp.isfinite(gnorm) and gnorm > 0

    # single-frame model (frames=1): restriction keeps the k finest levels
    cfg_sf = dcfg(dec_klevels=2, with_box_refine=True)
    m_sf, _, _ = build_model(cfg_sf)
    batch_sf, targets_sf = make_batch(jax.random.PRNGKey(3))
    p_sf = jax.jit(m_sf.init)(jax.random.PRNGKey(4), batch_sf, targets_sf)
    out = jax.jit(m_sf.apply)(p_sf, batch_sf, targets_sf)
    assert bool(jnp.isfinite(out["pred_boxes"]).all())
