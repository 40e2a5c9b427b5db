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
        for entry in self.script.get(self.frame, []):
            kind, idx, score, box = entry[:4]
            row = idx if kind == "track" else t + idx
            # softmax over 21 classes ~ sigmoid-ish control: class 0 strong
            logits[0, row, 20] = 0.0
            logits[0, row, 0] = np.log(score / (1 - score + 1e-8)) + 0.0
            # make softmax prob of class 0 ≈ score: set other classes -inf
            logits[0, row, 1:20] = -30.0
            boxes[0, row] = box
            # optional 5th element: embedding fill value (for reid tests)
            hs[0, row, :] = entry[4] if len(entry) > 4 else 100 + row
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


def test_reid_embed_distance_lsap():
    """Embed-distance reid of new detections vs INACTIVE tracks (reference
    tracker.py:170-267): a terminated track whose embedding matches a later
    detection resumes under its original id via scipy LSAP; a non-matching
    detection spawns a fresh id."""
    b1 = np.array([0.25, 0.5, 0.1, 0.2])
    b_far = np.array([0.75, 0.5, 0.1, 0.2])
    b_other = np.array([0.5, 0.25, 0.1, 0.2])
    script = {
        0: [("det", 0, 0.9, b1, 7.0)],  # track 0, embed filled with 7
        1: [],  # terminated -> inactive (embed stays 7)
        # frame 2: det at a NEW location with the SAME embedding -> reid;
        # second det with a different embedding -> new track
        2: [("det", 0, 0.9, b_far, 7.0), ("det", 1, 0.9, b_other, 50.0)],
    }
    t = make_tracker(
        script, inactive_patience=5, reid_sim_threshold=1.0,
        reid_score_thresh=0.99,  # keep the track-ROW revival path off
    )
    for _ in range(3):
        t.step(blob())
    ids = {tr.id for tr in t.tracks}
    assert ids == {0, 1}, ids  # id 0 resumed, one new id (not two new)
    assert t.num_reids == 1
    reid_tr = next(tr for tr in t.tracks if tr.id == 0)
    # reid updated pos to the new detection (xyxy of b_far on 200x100)
    np.testing.assert_allclose(reid_tr.pos, [140, 40, 160, 60], atol=0.5)
    assert reid_tr.count_inactive == 0
    assert not t.inactive_tracks


def test_reid_embed_threshold_blocks_distant_embeds():
    """reid_sim_threshold gates the LSAP assignment: an embedding farther
    than the threshold must NOT be re-identified."""
    b1 = np.array([0.25, 0.5, 0.1, 0.2])
    b_far = np.array([0.75, 0.5, 0.1, 0.2])
    script = {
        0: [("det", 0, 0.9, b1, 7.0)],
        1: [],
        2: [("det", 0, 0.9, b_far, 9.0)],  # embed dist = 2*sqrt(16) = 8
    }
    t = make_tracker(
        script, inactive_patience=5, reid_sim_threshold=1.0,
        reid_score_thresh=0.99,
    )
    for _ in range(3):
        t.step(blob())
    assert t.num_reids == 0
    assert {tr.id for tr in t.tracks} == {1}  # fresh id; 0 still inactive
    assert [tr.id for tr in t.inactive_tracks] == [0]


def test_reid_greedy_center_distance():
    """Greedy center-distance reid (reference tracker.py:230-267,
    reid_greedy_matching): matches by proximity, gated by track/item size,
    ignoring embeddings entirely."""
    b1 = np.array([0.25, 0.5, 0.1, 0.2])  # xyxy (40,40,60,60) on 200x100
    b_near = np.array([0.28, 0.5, 0.1, 0.2])  # center 6px away, within size
    b_far = np.array([0.75, 0.5, 0.1, 0.2])
    script = {
        0: [("det", 0, 0.9, b1, 7.0)],
        1: [],
        2: [("det", 0, 0.9, b_near, 50.0)],  # embeds differ: greedy ignores
        3: [],
        4: [],
    }
    t = make_tracker(
        script, inactive_patience=5, reid_greedy_matching=True,
        reid_sim_threshold=0.0,  # unused by the greedy path (dist set to 0)
        reid_score_thresh=0.99, steps_termination=1,
    )
    for _ in range(3):
        t.step(blob())
    assert t.num_reids == 1
    assert {tr.id for tr in t.tracks} == {0}

    # far detection: outside both size gates -> no greedy match
    script2 = {
        0: [("det", 0, 0.9, b1, 7.0)],
        1: [],
        2: [("det", 0, 0.9, b_far, 7.0)],
    }
    t2 = make_tracker(
        script2, inactive_patience=5, reid_greedy_matching=True,
        reid_score_thresh=0.99,
    )
    for _ in range(3):
        t2.step(blob())
    assert t2.num_reids == 0
    assert {tr.id for tr in t2.tracks} == {1}


def test_inactive_patience_expires_tracks():
    """inactive_patience (reference tracker.py:283-287): an inactive track
    older than the patience window is dropped and can no longer be
    re-identified — the returning object gets a NEW id."""
    b1 = np.array([0.25, 0.5, 0.1, 0.2])
    script = {
        0: [("det", 0, 0.9, b1, 7.0)],
        # frames 1-3: gone (count_inactive grows past patience=1)
        4: [("det", 0, 0.9, b1, 7.0)],  # same embedding, but too late
    }
    t = make_tracker(
        script, inactive_patience=1, reid_sim_threshold=1.0,
        reid_score_thresh=0.99,
    )
    for _ in range(5):
        t.step(blob())
    assert t.num_reids == 0
    assert {tr.id for tr in t.tracks} == {1}
    assert not t.inactive_tracks  # expired, not retained


def test_track_row_revival_of_inactive():
    """Inactive tracks are fed as track queries and revive through their
    OWN forward rows at reid_score_thresh (reference tracker.py:367-383) —
    distinct from detection-level reid."""
    b1 = np.array([0.25, 0.5, 0.1, 0.2])
    script = {
        0: [("det", 0, 0.9, b1)],
        1: [],  # -> inactive
        # frame 2: the inactive track's OWN row (slot 0: tracks list is
        # empty, inactive occupies the first slot) scores high again
        2: [("track", 0, 0.8, b1)],
    }
    t = make_tracker(script, inactive_patience=5, reid_score_thresh=0.6)
    for _ in range(3):
        t.step(blob())
    assert t.num_reids == 1
    assert {tr.id for tr in t.tracks} == {0}
    res = t.get_results()
    assert sorted(res[0].keys()) == [0, 2]  # not written while inactive


def test_public_detections_min_iou_0_5():
    """min_iou_0_5 public-detection filtering (reference tracker.py:150-168):
    keep only model detections overlapping a public det with IoU >= 0.5,
    one model det per public box."""
    b1 = np.array([0.25, 0.5, 0.1, 0.2])  # xyxy (40,40,60,60) on 200x100
    b2 = np.array([0.75, 0.5, 0.1, 0.2])  # xyxy (140,40,160,60)
    script = {0: [("det", 0, 0.9, b1), ("det", 1, 0.9, b2)]}
    t = make_tracker(script, public_detections="min_iou_0_5")
    bl = blob()
    bl["dets"] = np.array([[42.0, 40.0, 62.0, 60.0]])  # IoU~0.82 with b1 only
    t.step(bl)
    assert len(t.tracks) == 1
    np.testing.assert_allclose(t.tracks[0].pos, [40, 40, 60, 60], atol=0.5)

    # no public dets at all -> everything filtered
    t2 = make_tracker({0: [("det", 0, 0.9, b1)]},
                      public_detections="min_iou_0_5")
    t2.step(blob())
    assert len(t2.tracks) == 0


def test_track_nms_suppresses_converged_tracks():
    """Track-NMS (reference tracker.py:401-418): two live tracks whose boxes
    converge onto the same object are deduplicated, keeping the higher
    score."""
    b1 = np.array([0.2, 0.5, 0.1, 0.2])
    b2 = np.array([0.7, 0.5, 0.1, 0.2])
    script = {
        0: [("det", 0, 0.9, b1), ("det", 1, 0.8, b2)],
        # frame 1: both track rows emit the SAME box; id 1's score higher
        1: [("track", 0, 0.7, b1), ("track", 1, 0.9, b1)],
    }
    t = make_tracker(
        script, track_nms_thresh=0.5, detection_nms_thresh=0.0,
    )
    t.step(blob())
    t.step(blob())
    assert len(t.tracks) == 1
    assert t.tracks[0].id == 1  # higher-score survivor
    assert t.tracks[0].score > 0.85


def test_reid_sim_only_cycles_through_inactive():
    """reid_sim_only (reference tracker.py:556-557): every track is moved to
    inactive after each frame; persistence happens purely through the
    track-row revival path, keeping ids stable."""
    b1 = np.array([0.25, 0.5, 0.1, 0.2])
    script = {
        0: [("det", 0, 0.9, b1)],
        1: [("track", 0, 0.9, b1)],
        2: [("track", 0, 0.9, b1)],
    }
    t = make_tracker(
        script, reid_sim_only=True, inactive_patience=5,
        reid_score_thresh=0.6,
    )
    for _ in range(3):
        t.step(blob())
    res = t.get_results()
    assert set(res.keys()) == {0}
    assert sorted(res[0].keys()) == [0, 1, 2]
    assert t.num_reids == 2  # revived from inactive on frames 1 and 2
