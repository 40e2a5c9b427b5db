"""Online Tracker state-machine tests with a deterministic stub model.

Instead of random network weights, a stub `model.apply` emits controlled
detections so the state machine's behavior (spawn, persist, terminate,
inactive aging, NMS, public-detection filtering, result format) is
assertable — the host logic is exactly what reference tracker.py:269-557
implements.
"""
import jax.numpy as jnp
import numpy as np

from kinet_tpu.tracking import tracker as trk


class StubModel:
    """Emits scripted per-frame outputs.

    script[frame] = list of (slot_kind, slot_idx, score, box_cxcywh_norm).
    Track slots echo their query box with the given score; object query
    rows propose new detections.
    """

    def __init__(self, script, t_slots=8, n_queries=10, d=16):
        self.script = script
        self.frame = 0
        self.t_slots = t_slots
        self.n_queries = n_queries
        self.d = d

    def apply(self, params, batch, targets, **kw):
        t, q, d = self.t_slots, self.n_queries, self.d
        nq = t + q
        logits = np.full((1, nq, 21), -10.0, np.float32)
        logits[..., 20] = 10.0  # default: no-object
        boxes = np.full((1, nq, 4), 0.5, np.float32)
        hs = np.zeros((1, nq, d), np.float32)
        # track rows echo their input boxes weakly by default
        tq_boxes = np.asarray(targets.track_query_boxes[0])
        tq_mask = np.asarray(targets.track_query_mask[0])
        for s in range(t):
            if tq_mask[s]:
                boxes[0, s] = tq_boxes[s]
                hs[0, s, :] = s + 1
        for kind, idx, score, box in self.script.get(self.frame, []):
            row = idx if kind == "track" else t + idx
            # softmax over 21 classes ~ sigmoid-ish control: class 0 strong
            logits[0, row, 20] = 0.0
            logits[0, row, 0] = np.log(score / (1 - score + 1e-8)) + 0.0
            # make softmax prob of class 0 ≈ score: set other classes -inf
            logits[0, row, 1:20] = -30.0
            boxes[0, row] = box
            hs[0, row, :] = 100 + row
        self.frame += 1
        return {
            "pred_logits": jnp.asarray(logits),
            "pred_boxes": jnp.asarray(boxes),
            "hs_embed": jnp.asarray(hs),
        }


def make_tracker(script, **cfg_over):
    from kinet_tpu.models.postprocess import postprocess

    cfg = dict(
        detection_obj_score_thresh=0.4,
        track_obj_score_thresh=0.4,
        detection_nms_thresh=0.9,
        track_nms_thresh=0.9,
        public_detections=False,
        inactive_patience=-1,
        reid_sim_threshold=0.0,
        reid_sim_only=False,
        reid_score_thresh=0.4,
        reid_greedy_matching=False,
        prev_frame_dist=1,
        steps_termination=1,
    )
    cfg.update(cfg_over)
    model = StubModel(script)
    t = trk.Tracker(
        model, {}, postprocess, cfg,
        num_object_queries=10, num_track_slots=8, hidden_dim=16,
    )
    # bypass jit for the stub (it returns plain dicts)
    def fwd(params, batch, targets, orig_size, prev_features, prev_memory,
            pos_cache=None):
        out = model.apply(params, batch, targets)
        res = postprocess(out, orig_size)
        return {
            "scores": res["scores"],
            "labels": res["labels"],
            "boxes": res["boxes"],
            "hs_embed": out["hs_embed"],
            "frame_features": None,
        }

    t._fwd = fwd
    return t


def blob(h=100, w=200):
    return {
        "images": np.zeros((1, 32, 64, 3), np.float32),
        "pad_mask": np.zeros((1, 32, 64), bool),
        "orig_size": (h, w),
        "dets": np.zeros((0, 4), np.float32),
    }


def test_spawn_persist_terminate():
    box_a = np.array([0.25, 0.5, 0.1, 0.2])  # cxcywh normalized
    script = {
        0: [("det", 0, 0.9, box_a)],  # frame 0: new det -> track 0
        1: [("track", 0, 0.9, box_a)],  # frame 1: track survives
        2: [],  # frame 2: score collapses -> terminated
    }
    t = make_tracker(script)
    for _ in range(3):
        t.step(blob())
    results = t.get_results()
    assert 0 in results
    assert sorted(results[0].keys()) == [0, 1]
    bb = results[0][1]["bbox"]
    # cxcywh (0.25, 0.5, 0.1, 0.2) on 200x100 -> xyxy (40, 40, 60, 60)
    np.testing.assert_allclose(bb, [40, 40, 60, 60], atol=0.5)
    assert results[0][1]["score"] > 0.85
    # after termination the track is gone from active list
    assert len(t.tracks) == 0


def test_steps_termination_hysteresis():
    box_a = np.array([0.25, 0.5, 0.1, 0.2])
    script = {
        0: [("det", 0, 0.9, box_a)],
        1: [],  # low score 1: not yet terminated (steps_termination=2)
        2: [("track", 0, 0.9, box_a)],  # recovers
        3: [],
        4: [],  # two consecutive -> terminated
    }
    t = make_tracker(script, steps_termination=2)
    for _ in range(5):
        t.step(blob())
    res = t.get_results()
    # reference semantics: a below-threshold track stays active (with stale
    # state) until `steps_termination` consecutive misses, and is written to
    # results while active (tracker.py:344-365, 529-548) -> frames 0..3,
    # terminated at frame 4
    assert sorted(res[0].keys()) == [0, 1, 2, 3]
    assert len(t.tracks) == 0


def test_two_tracks_and_ids_monotonic():
    b1 = np.array([0.2, 0.5, 0.1, 0.2])
    b2 = np.array([0.7, 0.5, 0.1, 0.2])
    script = {
        0: [("det", 0, 0.9, b1)],
        1: [("track", 0, 0.9, b1), ("det", 1, 0.8, b2)],
        2: [("track", 0, 0.9, b1), ("track", 1, 0.8, b2)],
    }
    t = make_tracker(script)
    for _ in range(3):
        t.step(blob())
    res = t.get_results()
    assert set(res.keys()) == {0, 1}
    assert sorted(res[1].keys()) == [1, 2]


def test_detection_nms_suppresses_duplicate_new_det():
    b1 = np.array([0.25, 0.5, 0.1, 0.2])
    script = {
        0: [("det", 0, 0.9, b1)],
        # frame 1: track alive + duplicate detection at same spot
        1: [("track", 0, 0.9, b1), ("det", 1, 0.95, b1)],
    }
    t = make_tracker(script)
    t.step(blob())
    t.step(blob())
    # duplicate suppressed: still a single track
    assert len(t.tracks) == 1
    assert t.tracks[0].id == 0


def test_public_detections_center_distance():
    b1 = np.array([0.25, 0.5, 0.1, 0.2])  # -> xyxy (40,40,60,60) on 200x100
    b2 = np.array([0.75, 0.5, 0.1, 0.2])
    script = {0: [("det", 0, 0.9, b1), ("det", 1, 0.9, b2)]}
    t = make_tracker(script, public_detections="center_distance")
    bl = blob()
    bl["dets"] = np.array([[40.0, 40.0, 60.0, 60.0]])  # only b1 is public
    t.step(bl)
    assert len(t.tracks) == 1
    np.testing.assert_allclose(t.tracks[0].pos, [40, 40, 60, 60], atol=0.5)
