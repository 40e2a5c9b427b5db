"""BatchedTracker equivalence: N sequences stepped through one batched
forward must produce the same per-sequence results as N independent
Trackers (batching moves WHERE the forward runs, never a decision)."""
import dataclasses

import jax
import numpy as np

from kinet_tpu.config import load_config
from kinet_tpu.models.build import build_model
from kinet_tpu.models.postprocess import postprocess
from kinet_tpu.structs import ImageBatch, Targets
from kinet_tpu.tracking.batched import BatchedTracker, run_batched
from kinet_tpu.tracking.tracker import Tracker

TRACKER_CFG = dict(
    detection_obj_score_thresh=0.3,
    track_obj_score_thresh=0.3,
    detection_nms_thresh=0.9,
    track_nms_thresh=0.9,
    public_detections=False,
    inactive_patience=5,
    reid_sim_threshold=10.0,
    reid_sim_only=False,
    reid_score_thresh=0.8,
    reid_greedy_matching=False,
    prev_frame_dist=1,
    steps_termination=1,
)


def _tiny_cfg(**over):
    cfg = load_config("train.yaml")
    return cfg.replace(
        dataset="mot", backbone="resnet_test", hidden_dim=32, nheads=2,
        enc_layers=1, dec_layers=2, dim_feedforward=64, num_queries=12,
        max_objects=5, tracking=True, max_track_queries=4, dropout=0.0,
        **over,
    )


def _biased_params(model, batch, targets):
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch, targets)
    # confident person-class predictions from random weights (the test
    # drives the batching equivalence, not accuracy); vanilla DETR names
    # the head class_embed, deformable class_embed{layer}
    key = (
        "class_embed"
        if "class_embed" in params["params"]
        else "class_embed0"
    )
    bias = np.full(params["params"][key]["bias"].shape, -4.0, np.float32)
    bias[0] = 4.0
    params["params"][key]["bias"] = bias
    return params


def _sequences(n_seq=2, n_frames=3, h=64, w=96, seed=0):
    rng = np.random.default_rng(seed)
    seqs = []
    for s in range(n_seq):
        frames = []
        for f in range(n_frames):
            frames.append(
                {
                    "images": rng.normal(
                        size=(1, h, w, 3)
                    ).astype(np.float32),
                    "pad_mask": np.zeros((1, h, w), bool),
                    "orig_size": (h, w),
                    "dets": np.zeros((0, 4), np.float32),
                }
            )
        seqs.append(frames)
    return seqs


def _results_equal(a, b, atol=1e-3):
    assert set(a.keys()) == set(b.keys()), (sorted(a), sorted(b))
    for tid in a:
        assert set(a[tid].keys()) == set(b[tid].keys()), tid
        for f in a[tid]:
            np.testing.assert_allclose(
                a[tid][f]["bbox"], b[tid][f]["bbox"], atol=atol
            )
            assert abs(a[tid][f]["score"] - b[tid][f]["score"]) < 1e-3


def _run_equivalence(cfg, n_seq=2, n_frames=3, tracker_cfg=TRACKER_CFG):
    model, _, _ = build_model(cfg)
    seqs = _sequences(n_seq=n_seq, n_frames=n_frames)
    b0 = seqs[0][0]
    batch = ImageBatch(
        images=b0["images"], pad_mask=b0["pad_mask"]
    )
    targets = Targets.create(
        np.full((1, 1, 4), 0.5, np.float32), np.zeros((1, 1), np.int32),
        np.zeros((1, 1), bool),
        num_track_queries=int(cfg.max_track_queries),
        hidden_dim=int(cfg.hidden_dim),
    )
    params = _biased_params(model, batch, targets)
    kw = dict(
        num_object_queries=int(cfg.num_queries),
        num_track_slots=int(cfg.max_track_queries),
        hidden_dim=int(cfg.hidden_dim),
    )

    singles = []
    for s in range(n_seq):
        tr = Tracker(model, params, postprocess, tracker_cfg, **kw)
        for blob in seqs[s]:
            tr.step(blob)
        singles.append(tr.get_results())
        assert singles[-1], "no tracks spawned — fixture broken"

    batched = BatchedTracker(
        model, params, postprocess, tracker_cfg, n_sequences=n_seq, **kw
    )
    run_batched(batched, [iter(s) for s in seqs])
    for s in range(n_seq):
        _results_equal(batched.get_results(s), singles[s])


def test_batched_equals_single_vanilla_detr():
    _run_equivalence(_tiny_cfg())


def test_batched_interleaved_equals_single():
    """batch_exec=interleaved (B inlined B=1 subgraphs in one jit) must
    produce the same per-sequence results as independent Trackers —
    including the stacked memory/pos caches of the flagship family."""
    cfg = load_config(
        "train.yaml",
        named=["train_deformable", "train_tracking", "train_multi_frame"],
    ).replace(
        dataset="mot", backbone="resnet_test", hidden_dim=32, nheads=2,
        enc_layers=2, dec_layers=1, dim_feedforward=64, num_queries=12,
        max_objects=5, max_track_queries=4, dropout=0.0,
        num_feature_levels=4, dec_n_points=2, enc_n_points=2,
    )
    _run_equivalence(
        cfg, n_seq=2, n_frames=3,
        tracker_cfg={**TRACKER_CFG, "batch_exec": "interleaved"},
    )


def test_batched_equals_single_flagship_family():
    """Deformable multi-frame + cache_prev_encoder: the stacked encoded-
    memory / pos caches must round-trip through the batched forward."""
    cfg = load_config(
        "train.yaml",
        named=["train_deformable", "train_tracking", "train_multi_frame"],
    ).replace(
        dataset="mot", backbone="resnet_test", hidden_dim=32, nheads=2,
        enc_layers=2, dec_layers=1, dim_feedforward=64, num_queries=12,
        max_objects=5, max_track_queries=4, dropout=0.0,
        num_feature_levels=4, dec_n_points=2, enc_n_points=2,
    )
    _run_equivalence(cfg, n_seq=2, n_frames=3)


def test_batched_uneven_lengths():
    """A finished sequence's slot rides along; its results stop growing."""
    cfg = _tiny_cfg()
    model, _, _ = build_model(cfg)
    seqs = _sequences(n_seq=2, n_frames=4)
    seqs[1] = seqs[1][:2]  # second sequence is shorter
    b0 = seqs[0][0]
    batch = ImageBatch(images=b0["images"], pad_mask=b0["pad_mask"])
    targets = Targets.create(
        np.full((1, 1, 4), 0.5, np.float32), np.zeros((1, 1), np.int32),
        np.zeros((1, 1), bool), num_track_queries=4, hidden_dim=32,
    )
    params = _biased_params(model, batch, targets)
    kw = dict(num_object_queries=12, num_track_slots=4, hidden_dim=32)
    batched = BatchedTracker(
        model, params, postprocess, TRACKER_CFG, n_sequences=2, **kw
    )
    run_batched(batched, [iter(s) for s in seqs])
    r0, r1 = batched.get_results(0), batched.get_results(1)
    assert r0 and r1
    assert max(f for t in r0.values() for f in t) == 3
    assert max(f for t in r1.values() for f in t) <= 1


def test_batched_zero_frame_slot_rides_on_donor():
    """A sequence with an empty frame range (zero frames) must not crash
    the batched session (advisor r3: the never-started slot used to trip
    'finished before its first frame'); it rides on a live slot's inputs
    and produces no results."""
    cfg = _tiny_cfg()
    model, _, _ = build_model(cfg)
    seqs = _sequences(n_seq=2, n_frames=3)
    seqs[1] = []  # zero-frame sequence slot
    b0 = seqs[0][0]
    batch = ImageBatch(images=b0["images"], pad_mask=b0["pad_mask"])
    targets = Targets.create(
        np.full((1, 1, 4), 0.5, np.float32), np.zeros((1, 1), np.int32),
        np.zeros((1, 1), bool), num_track_queries=4, hidden_dim=32,
    )
    params = _biased_params(model, batch, targets)
    kw = dict(num_object_queries=12, num_track_slots=4, hidden_dim=32)

    single = Tracker(model, params, postprocess, TRACKER_CFG, **kw)
    for blob in seqs[0]:
        single.step(blob)

    batched = BatchedTracker(
        model, params, postprocess, TRACKER_CFG, n_sequences=2, **kw
    )
    run_batched(batched, [iter(s) for s in seqs])
    _results_equal(batched.get_results(0), single.get_results())
    assert batched.get_results(1) == {}

    # every slot empty: step() is a no-op, run_batched terminates
    batched.reset()
    run_batched(batched, [iter([]), iter([])])
    assert batched.get_results(0) == {} and batched.get_results(1) == {}


def test_batched_kinematic_equals_single():
    """BatchedTrackerKinematic: N detection sequences through one forward
    equal N independent TrackerKinematic runs (real dual-stream model)."""
    import flax
    import jax.numpy as jnp

    from kinet_tpu.structs import KineBatch
    from kinet_tpu.tracking.batched import BatchedTrackerKinematic
    from kinet_tpu.tracking.kine_tracker import TrackerKinematic

    l, enc = 3, 4
    cfg = load_config("train.yaml", named=["train_kinet"]).replace(
        dataset="mot_kine", hidden_dim=32, nheads=2, dim_feedforward=32,
        num_queries=8, dropout=0.0, max_number_detection=8,
        max_track_queries=6, track_prev_frame_range=l,
        encoding_dim_tracklets=enc, use_encoding_tracklets=True,
        tracking=True,
    )
    model, _, _ = build_model(cfg)
    e_dim = l * 4 * enc + l * 1
    kb = KineBatch(
        detections=jnp.zeros((1, 8, 4)), metadata=jnp.zeros((1, 8, 1)),
        pad_mask=jnp.zeros((1, 8), bool),
    )
    tg = Targets.create(
        jnp.zeros((1, 1, 4)), jnp.zeros((1, 1), jnp.int32),
        jnp.zeros((1, 1), bool), num_track_queries=6, hidden_dim=e_dim,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), kb, tg)
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    for k in flat:
        if k.endswith("class_embed/bias"):
            b = np.array(flat[k], copy=True)
            b[...] = -8.0
            b[..., 0] = 8.0
            flat[k] = jnp.asarray(b)
    params = flax.traverse_util.unflatten_dict(flat, sep="/")

    tcfg = dict(
        detection_obj_score_thresh=0.0, track_obj_score_thresh=0.0,
        detection_nms_thresh=0.9, track_nms_thresh=0.9,
        public_detections=False, inactive_patience=-1,
        reid_sim_threshold=0.0, reid_sim_only=False,
        reid_score_thresh=0.0, reid_greedy_matching=False,
        prev_frame_dist=1, steps_termination=1,
    )
    kw = dict(
        num_object_queries=8, num_track_slots=6,
        trail_len=l, trail_enc_dim=enc, meta_dim=1,
    )

    rng = np.random.default_rng(3)
    seqs = []
    for s in range(2):
        frames = []
        for f in range(3):
            k = 3 + s
            frames.append(
                {
                    "detections": rng.uniform(
                        0.2, 0.7, (k, 4)
                    ).astype(np.float32),
                    "metadata": np.full((k, 1), 0.9, np.float32),
                    "orig_size": (100, 200),
                    "max_detections": 8,
                }
            )
        seqs.append(frames)

    singles = []
    for s in range(2):
        tr = TrackerKinematic(model, params, postprocess, tcfg, **kw)
        for blob in seqs[s]:
            tr.step(blob)
        singles.append(tr.get_results())
        assert singles[-1], "no kine tracks spawned — fixture broken"

    batched = BatchedTrackerKinematic(
        model, params, postprocess, tcfg, n_sequences=2, **kw
    )
    run_batched(batched, [iter(s) for s in seqs])
    for s in range(2):
        _results_equal(batched.get_results(s), singles[s])
