"""TrackerKinematic state-machine tests with a deterministic stub model."""
import jax
import jax.numpy as jnp
import numpy as np

from kinet_tpu.tracking.kine_tracker import TrackerKinematic


class StubKineModel:
    """script[frame] = list of (kind, idx, score, rel_box_cxcywh)."""

    def __init__(self, script, t_slots=6, n_det=8):
        self.script = script
        self.frame = 0
        self.t = t_slots
        self.n = n_det

    def apply(self, params, kb, targets, **kw):
        nq = self.t + self.n
        logits = np.full((1, nq, 21), -10.0, np.float32)
        logits[..., 20] = 10.0
        boxes = np.full((1, nq, 4), 0.5, np.float32)
        for kind, idx, score, box in self.script.get(self.frame, []):
            row = idx if kind == "track" else self.t + idx
            logits[0, row, 20] = 0.0
            logits[0, row, 0] = np.log(score / (1 - score + 1e-8))
            logits[0, row, 1:20] = -30.0
            boxes[0, row] = box
        self.frame += 1
        return {
            "pred_logits": jnp.asarray(logits),
            "pred_boxes": jnp.asarray(boxes),
            "hs_embed": jnp.zeros((1, nq, 8)),
        }


def make_kine_tracker(script, **over):
    from kinet_tpu.models.postprocess import postprocess

    cfg = dict(
        detection_obj_score_thresh=0.4, track_obj_score_thresh=0.4,
        detection_nms_thresh=0.9, track_nms_thresh=0.9,
        public_detections=False, inactive_patience=-1,
        reid_sim_threshold=0.0, reid_sim_only=False, reid_score_thresh=0.4,
        reid_greedy_matching=False, prev_frame_dist=1, steps_termination=1,
    )
    cfg.update(over)
    model = StubKineModel(script)
    t = TrackerKinematic(
        model, {}, postprocess, cfg,
        num_object_queries=8, num_track_slots=6,
        trail_len=3, trail_enc_dim=4, meta_dim=1,
    )

    def fwd(params, kb, targets, orig_size):
        out = model.apply(params, kb, targets)
        res = postprocess(out, orig_size)
        return {
            "scores": res["scores"], "labels": res["labels"],
            "boxes": res["boxes"], "rel_boxes": out["pred_boxes"],
        }

    t._fwd_kine = fwd
    return t


def blob(k=2):
    return {
        "detections": np.full((k, 4), 0.5, np.float32),
        "metadata": np.full((k, 1), 0.9, np.float32),
        "orig_size": (100, 200),
        "max_detections": 8,
    }


def test_kine_spawn_persist_terminate():
    b1 = np.array([0.25, 0.5, 0.1, 0.2], np.float32)
    b1b = np.array([0.27, 0.5, 0.1, 0.2], np.float32)
    script = {
        0: [("det", 0, 0.9, b1)],
        1: [("track", 0, 0.9, b1b)],
        2: [],
    }
    t = make_kine_tracker(script)
    for _ in range(3):
        t.step(blob())
    res = t.get_results()
    assert 0 in res and sorted(res[0]) == [0, 1]
    np.testing.assert_allclose(res[0][1]["bbox"], [44, 40, 64, 60], atol=0.5)
    assert len(t.tracks) == 0  # terminated


def test_kine_trail_accumulates():
    b1 = np.array([0.25, 0.5, 0.1, 0.2], np.float32)
    moves = [
        np.array([0.25 + 0.02 * i, 0.5, 0.1, 0.2], np.float32) for i in range(4)
    ]
    script = {0: [("det", 0, 0.9, moves[0])]}
    for f in range(1, 4):
        script[f] = [("track", 0, 0.9, moves[f])]
    t = make_kine_tracker(script)
    for _ in range(4):
        t.step(blob())
    tr = t.tracks[0]
    trail, meta = tr.get_trail(3)
    assert trail.shape == (3, 4)
    # last three positions follow the movement
    np.testing.assert_allclose(trail[-1][0], 0.31, atol=1e-5)
    np.testing.assert_allclose(trail[-2][0], 0.29, atol=1e-5)


def test_kine_two_tracks():
    b1 = np.array([0.2, 0.5, 0.1, 0.2], np.float32)
    b2 = np.array([0.7, 0.5, 0.1, 0.2], np.float32)
    script = {
        0: [("det", 0, 0.9, b1)],
        1: [("track", 0, 0.9, b1), ("det", 1, 0.8, b2)],
        2: [("track", 0, 0.9, b1), ("track", 1, 0.8, b2)],
    }
    t = make_kine_tracker(script)
    for _ in range(3):
        t.step(blob())
    res = t.get_results()
    assert set(res.keys()) == {0, 1}


def test_kine_tracker_real_dual_stream_model():
    """TrackerKinematic driven by the REAL dual-stream
    KinematicDetectorTransformer (reference detr.py:288-425) — no scripted
    stub: the jitted forward, trail encoding and state machine run together."""
    import jax

    from kinet_tpu.config import load_config
    from kinet_tpu.models.build import build_model
    from kinet_tpu.models.postprocess import postprocess
    from kinet_tpu.structs import KineBatch, Targets

    l, enc = 3, 4
    cfg = load_config("train.yaml", named=["train_kinet"]).replace(
        dataset="mot_kine", hidden_dim=32, nheads=2, dim_feedforward=32,
        num_queries=8, dropout=0.0, max_number_detection=8,
        max_track_queries=6, track_prev_frame_range=l,
        encoding_dim_tracklets=enc, use_encoding_tracklets=True, tracking=True,
    )
    model, _, _ = build_model(cfg)
    assert type(model).__name__ == "KinematicDetectorTransformer"
    e_dim = l * 4 * enc + l * 1
    kb = KineBatch(
        detections=jnp.zeros((1, 8, 4)), metadata=jnp.zeros((1, 8, 1)),
        pad_mask=jnp.zeros((1, 8), bool),
    )
    tg = Targets.create(
        jnp.zeros((1, 1, 4)), jnp.zeros((1, 1), jnp.int32),
        jnp.zeros((1, 1), bool), num_track_queries=6, hidden_dim=e_dim,
    )
    import jax.random as jr

    params = jax.jit(model.init)(jr.PRNGKey(0), kb, tg)
    # bias the class head toward the person class so the untrained model
    # emits confident detections (the test drives the tracker integration,
    # not accuracy)
    import flax

    flat = flax.traverse_util.flatten_dict(params, sep="/")
    for k in flat:
        if k.endswith("class_embed/bias"):
            b = np.array(flat[k], copy=True)
            b[...] = -8.0
            b[..., 0] = 8.0
            flat[k] = jnp.asarray(b)
    params = flax.traverse_util.unflatten_dict(flat, sep="/")

    t = TrackerKinematic(
        model, params, postprocess,
        dict(
            detection_obj_score_thresh=0.0, track_obj_score_thresh=0.0,
            detection_nms_thresh=0.9, track_nms_thresh=0.9,
            public_detections=False, inactive_patience=-1,
            reid_sim_threshold=0.0, reid_sim_only=False,
            reid_score_thresh=0.0, reid_greedy_matching=False,
            prev_frame_dist=1, steps_termination=1,
        ),
        num_object_queries=8, num_track_slots=6,
        trail_len=l, trail_enc_dim=enc, meta_dim=1,
    )
    rng = np.random.default_rng(0)
    for f in range(3):
        t.step(
            {
                "detections": rng.uniform(0.3, 0.7, (2, 4)).astype(np.float32),
                "metadata": np.full((2, 1), 0.9, np.float32),
                "orig_size": (100, 200),
                "max_detections": 8,
            }
        )
    res = t.get_results()
    # thresholds at 0 -> the real forward spawned tracks and wrote frames
    assert len(res) > 0
    for tid, frames in res.items():
        for fi, r in frames.items():
            assert r["bbox"].shape == (4,)
            assert np.isfinite(r["bbox"]).all()
