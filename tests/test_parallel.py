"""Multi-device (8× virtual CPU) data-parallel train step + driver contract."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_mesh_creation():
    from kinet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("data", "model")


def test_optimizer_param_groups():
    from kinet_tpu.config import load_config
    from kinet_tpu.engine.state import param_labels
    from kinet_tpu.models.build import build_model
    from kinet_tpu.structs import ImageBatch, Targets

    cfg = load_config("train.yaml", named=["train_deformable"]).replace(
        dataset="mot", backbone="resnet_test", hidden_dim=32, nheads=2,
        enc_layers=1, dec_layers=1, dim_feedforward=32, num_queries=4,
        dropout=0.0, num_feature_levels=2,
    )
    model, _, _ = build_model(cfg)
    img = jnp.zeros((1, 32, 32, 3))
    batch = ImageBatch(images=img, pad_mask=jnp.zeros((1, 32, 32), bool))
    targets = Targets.create(
        jnp.full((1, 2, 4), 0.5), jnp.zeros((1, 2), jnp.int32),
        jnp.ones((1, 2), bool), num_track_queries=0, hidden_dim=32,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch, targets)
    labels = param_labels(params)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    groups = {}
    for path, lab in flat:
        groups.setdefault(lab, []).append(
            "/".join(str(getattr(p, "key", p)) for p in path)
        )
    assert "backbone" in groups and "frozen" in groups and "base" in groups
    assert "linear_proj" in groups  # sampling_offsets exist in deformable
    # conv1/layer1 frozen; layer2+ convs trainable; BN always frozen
    assert any("layer2" in p and "conv" in p for p in groups["backbone"])
    assert all("layer1_" not in p for p in groups["backbone"])
    assert any("conv1" in p for p in groups["frozen"])
    for lab, paths in groups.items():
        if lab != "frozen":
            assert all("running_" not in p for p in paths), (lab,)
            assert all(
                not any(s in p.split("/") for s in ("bn1", "bn2", "bn3"))
                for p in paths
            ), lab


def test_spatial_parallel_forward():
    """SP on an 8-device mesh: ONE frame's HEIGHT dim sharded over all
    devices (parallel/sp.py) — GSPMD spatially partitions the backbone
    convs (halo exchange) and the flattened encoder tokens; the output
    must equal the replicated forward to float-reorder noise."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from kinet_tpu.config import load_config
    from kinet_tpu.models.build import build_model
    from kinet_tpu.parallel.mesh import make_mesh
    from kinet_tpu.parallel.sp import make_spatial_apply, spatial_place
    from kinet_tpu.structs import ImageBatch, Targets

    cfg = load_config(
        "train.yaml", named=["train_deformable", "train_tracking"]
    ).replace(
        dataset="mot", backbone="resnet_test", hidden_dim=32, nheads=2,
        enc_layers=1, dec_layers=1, dim_feedforward=64, num_queries=8,
        max_track_queries=8, dropout=0.0, aux_loss=False,
        num_feature_levels=2, dec_n_points=2, enc_n_points=2,
        with_box_refine=False,
    )
    model, _, _ = build_model(cfg)
    batch = ImageBatch(
        images=jax.random.normal(jax.random.PRNGKey(0), (1, 64, 96, 3)),
        pad_mask=jnp.zeros((1, 64, 96), bool),
    )
    targets = Targets.create(
        jnp.asarray([[[0.3, 0.3, 0.2, 0.2], [0.7, 0.6, 0.15, 0.25]]]),
        jnp.zeros((1, 2), jnp.int32), jnp.ones((1, 2), bool),
        num_track_queries=8, hidden_dim=32,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch, targets)

    mesh = make_mesh(n_data=8, n_model=1)
    rep = NamedSharding(mesh, P())
    p_rep = jax.device_put(params, rep)

    # spatially-partitioned forward: height split 8-ways, params replicated
    sp_apply = make_spatial_apply(model, mesh)
    sp_batch = spatial_place(mesh, batch)
    assert sp_batch.images.sharding.spec == P(None, "data")
    out_sp = sp_apply(p_rep, sp_batch, jax.device_put(targets, rep),
                      deterministic=True)

    # replicated reference forward on the same mesh
    with mesh:
        out_rep = jax.jit(model.apply, out_shardings=rep)(
            p_rep, jax.device_put(batch, rep), jax.device_put(targets, rep),
            deterministic=True,
        )
    np.testing.assert_allclose(
        np.asarray(out_sp["pred_logits"]),
        np.asarray(out_rep["pred_logits"]), atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_sp["pred_boxes"]),
        np.asarray(out_rep["pred_boxes"]), atol=2e-5,
    )
    # outputs land replicated: the host tracker consumes whole rows
    assert out_sp["pred_boxes"].sharding.is_fully_replicated


def test_spatial_parallel_tracker_session():
    """The full host tracker state machine served over an 8-device SP
    mesh (Tracker(spatial_mesh=...) → make_forward_fn sp path) must
    produce the same tracks as the single-device tracker."""
    from kinet_tpu.config import load_config
    from kinet_tpu.models.build import build_model
    from kinet_tpu.models.postprocess import build_postprocessors
    from kinet_tpu.parallel.mesh import make_mesh
    from kinet_tpu.structs import ImageBatch, Targets
    from kinet_tpu.tracking.tracker import Tracker

    cfg = load_config(
        "train.yaml", named=["train_deformable", "train_tracking"]
    ).replace(
        dataset="mot", backbone="resnet_test", hidden_dim=32, nheads=2,
        enc_layers=1, dec_layers=1, dim_feedforward=64, num_queries=8,
        max_track_queries=8, dropout=0.0, aux_loss=False,
        num_feature_levels=2, dec_n_points=2, enc_n_points=2,
        with_box_refine=False,
    )
    model, _, _ = build_model(cfg)
    batch = ImageBatch(
        images=jax.random.normal(jax.random.PRNGKey(0), (1, 64, 96, 3)),
        pad_mask=jnp.zeros((1, 64, 96), bool),
    )
    targets = Targets.create(
        jnp.asarray([[[0.3, 0.3, 0.2, 0.2], [0.7, 0.6, 0.15, 0.25]]]),
        jnp.zeros((1, 2), jnp.int32), jnp.ones((1, 2), bool),
        num_track_queries=8, hidden_dim=32,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch, targets)
    # make spawns deterministic: push the class-0 logit well above the
    # focal-prior init so every query detects class 0 (num_classes=20 for
    # mot → argmax label is otherwise uniform-random at init)
    import flax

    params = flax.core.unfreeze(params)

    def _boost(tree):
        for k, v in tree.items():
            if not isinstance(v, dict):
                continue
            if k.startswith("class_embed") and "bias" in v:
                v["bias"] = jnp.asarray(np.asarray(v["bias"])).at[0].set(2.0)
            else:
                _boost(v)

    _boost(params["params"])

    post = build_postprocessors(cfg)["bbox"]
    tracker_cfg = dict(
        detection_obj_score_thresh=0.005, track_obj_score_thresh=0.005,
        detection_nms_thresh=0.9, track_nms_thresh=0.9,
        public_detections=False, inactive_patience=-1,
        reid_sim_threshold=0.0, reid_sim_only=False,
        reid_score_thresh=0.005, reid_greedy_matching=False,
        prev_frame_dist=1, steps_termination=1,
    )

    def run(mesh):
        t = Tracker(
            model, params, post, tracker_cfg,
            num_object_queries=8, num_track_slots=8, hidden_dim=32,
            spatial_mesh=mesh,
        )
        for i in range(3):
            img = jax.random.normal(
                jax.random.PRNGKey(10 + i), (1, 64, 96, 3)
            )
            t.step({
                "images": np.asarray(img),
                "pad_mask": np.zeros((1, 64, 96), bool),
                "orig_size": (128, 192),
                "dets": np.zeros((0, 4), np.float32),
            })
        return t.get_results()

    res_sp = run(make_mesh(n_data=8, n_model=1))
    res_single = run(None)
    # at init-scale logits something always clears the 0.05 threshold —
    # assert the session did real work, then exact track-level agreement
    assert res_single, "no tracks spawned — test lost its teeth"
    assert set(res_sp) == set(res_single)
    for tid in res_single:
        assert set(res_sp[tid]) == set(res_single[tid])
        for frame in res_single[tid]:
            a, b = res_sp[tid][frame], res_single[tid][frame]
            assert a["obj_ind"] == b["obj_ind"]
            np.testing.assert_allclose(a["bbox"], b["bbox"], atol=1e-4)
            np.testing.assert_allclose(a["score"], b["score"], atol=1e-5)


def test_tensor_parallel_train_step():
    """DP x TP on a 4x2 mesh: Megatron-style weight shardings via GSPMD
    (parallel/tp.py) — the train step must compile, run, and produce the
    SAME loss as the replicated run (shardings are layout, not math)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from kinet_tpu.config import load_config
    from kinet_tpu.engine.state import TrainState, build_optimizer
    from kinet_tpu.engine.train_step import make_train_step
    from kinet_tpu.models.build import build_model
    from kinet_tpu.parallel.mesh import make_mesh
    from kinet_tpu.parallel.tp import shard_params_tp, tp_partition_specs
    from kinet_tpu.structs import ImageBatch, Targets

    cfg = load_config(
        "train.yaml", named=["train_deformable", "train_tracking"]
    ).replace(
        dataset="mot", backbone="resnet_test", hidden_dim=32, nheads=2,
        enc_layers=1, dec_layers=1, dim_feedforward=64, num_queries=8,
        max_track_queries=8, dropout=0.0, aux_loss=False,
        num_feature_levels=2, dec_n_points=2, enc_n_points=2,
        with_box_refine=False,
    )
    model, criterion, _ = build_model(cfg)
    b = 4
    batch = ImageBatch(
        images=jax.random.normal(jax.random.PRNGKey(0), (b, 64, 64, 3)),
        pad_mask=jnp.zeros((b, 64, 64), bool),
    )
    # DISTINCT target boxes: identical boxes make every matcher cost a
    # tie, and TP's reduction reorder flips the tie-break (loss then
    # differs by the assignment, not the math)
    boxes = jnp.asarray(
        [[[0.3, 0.3, 0.2, 0.2], [0.7, 0.6, 0.15, 0.25]]] * b
    )
    targets = Targets.create(
        boxes, jnp.zeros((b, 2), jnp.int32),
        jnp.ones((b, 2), bool), num_track_queries=8, hidden_dim=32,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch, targets)

    # some weights must actually be sharded over 'model'
    mesh = make_mesh(n_data=4, n_model=2)
    specs = tp_partition_specs(params["params"], 2)
    sharded_specs = [
        s for s in jax.tree_util.tree_leaves(
            specs, is_leaf=lambda x: isinstance(x, P)
        ) if s != P()
    ]
    assert len(sharded_specs) > 20, len(sharded_specs)

    def run(mesh_):
        p = (
            shard_params_tp(params, mesh_)
            if mesh_.shape["model"] > 1
            else jax.tree_util.tree_map(
                lambda x: jax.device_put(x, NamedSharding(mesh_, P())),
                params,
            )
        )
        dsh = NamedSharding(mesh_, P("data"))
        sh = lambda t: jax.tree_util.tree_map(
            lambda x: jax.device_put(x, dsh), t
        )
        with mesh_:
            out = jax.jit(model.apply)(p, sh(batch), sh(targets))
            tx = build_optimizer(cfg, p, steps_per_epoch=100)
            state = TrainState.create(p, tx)
            step = make_train_step(model, criterion, tx, cfg)
            state, losses = step(
                state, jax.random.PRNGKey(2), sh(batch), sh(targets),
                sh(batch), sh(targets),
            )
        return np.asarray(out["pred_logits"]), float(losses["loss"])

    logits_tp, loss_tp = run(mesh)
    logits_dp, loss_dp = run(make_mesh(n_data=4, n_model=1))
    # the hard guarantee: shardings are layout, not math — the forward is
    # equal to float-reorder noise
    np.testing.assert_allclose(logits_tp, logits_dp, atol=2e-5)
    # the full train step includes the Hungarian matcher: ~1e-6 logit
    # reorder noise can flip near-tied assignments at init, shifting the
    # loss by O(1e-3) relative — assert at that granularity
    np.testing.assert_allclose(loss_tp, loss_dp, rtol=5e-3)
