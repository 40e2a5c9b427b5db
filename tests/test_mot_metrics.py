"""CLEAR-MOT / IDF1 evaluator tests against hand-computed scenarios."""
import numpy as np

from kinet_tpu.utils.mot_metrics import (
    MOTAccumulator,
    evaluate_mot_accums,
    iou_distance,
)


def box(x, y, w=10, h=10):
    return np.array([x, y, w, h], np.float64)


def test_perfect_tracking():
    acc = MOTAccumulator()
    for f in range(5):
        gt = np.stack([box(0, 0), box(50, 50)])
        acc.update([1, 2], ["a", "b"], iou_distance(gt, gt))
    m = acc.metrics()
    assert m["mota"] == 1.0
    assert m["idf1"] == 1.0
    assert m["num_switches"] == 0
    assert m["motp"] == 0.0


def test_id_switch_counted():
    acc = MOTAccumulator()
    gt = np.stack([box(0, 0), box(50, 50)])
    # frames 0-1: correct; frames 2-3: hypotheses swap identities
    acc.update([1, 2], ["a", "b"], iou_distance(gt, gt))
    acc.update([1, 2], ["a", "b"], iou_distance(gt, gt))
    acc.update([1, 2], ["b", "a"], iou_distance(gt, gt))
    acc.update([1, 2], ["b", "a"], iou_distance(gt, gt))
    m = acc.metrics()
    assert m["num_switches"] == 2  # both tracks switch once at frame 2
    assert m["num_misses"] == 0 and m["num_false_positives"] == 0
    # MOTA = 1 - 2/8
    np.testing.assert_allclose(m["mota"], 1 - 2 / 8)
    # IDF1: best global match covers 2 of 4 frames per trajectory
    np.testing.assert_allclose(m["idf1"], 0.5)


def test_fp_and_miss():
    acc = MOTAccumulator()
    gt = np.stack([box(0, 0)])
    hyp_far = np.stack([box(100, 100)])
    for _ in range(4):
        acc.update([1], ["x"], iou_distance(gt, hyp_far))
    m = acc.metrics()
    assert m["num_misses"] == 4 and m["num_false_positives"] == 4
    np.testing.assert_allclose(m["mota"], 1 - 8 / 4)
    assert m["idf1"] == 0.0


def test_match_persistence_overrides_greedy():
    """CLEAR-MOT keeps an existing correspondence even if a new hypothesis
    is slightly closer."""
    acc = MOTAccumulator()
    g = np.stack([box(0, 0)])
    h0 = np.stack([box(1, 1), box(100, 100)])  # 'a' close, 'b' far
    acc.update([1], ["a", "b"], iou_distance(g, h0))
    # next frame: 'b' jumps exactly onto gt, 'a' still overlapping (IoU .68)
    h1_boxes = np.stack([box(1, 1), box(0, 0)])
    acc.update([1], ["a", "b"], iou_distance(g, h1_boxes))
    m = acc.metrics()
    assert m["num_switches"] == 0  # persisted match with 'a'
    assert m["num_false_positives"] == 2  # 'b' unmatched both frames


def test_overall_summary_namespacing():
    a1, a2 = MOTAccumulator(), MOTAccumulator()
    gt = np.stack([box(0, 0)])
    for _ in range(3):
        a1.update([1], [0], iou_distance(gt, gt))
        a2.update([1], [0], iou_distance(gt, gt))
    summary = evaluate_mot_accums([a1, a2], ["seq1", "seq2"])
    assert summary["OVERALL"]["mota"] == 1.0
    assert summary["OVERALL"]["idf1"] == 1.0
    assert summary["OVERALL"]["num_objects"] == 6


# ---------------------------------------------------------------------------
# Adversarial motmetrics-semantics oracles
# ---------------------------------------------------------------------------
def _dist(gt_boxes, hyp_boxes):
    from kinet_tpu.utils.mot_metrics import iou_distance

    return iou_distance(np.asarray(gt_boxes, float), np.asarray(hyp_boxes, float))


def test_match_continuity_preferred_over_closer_hypothesis():
    """motmetrics keeps an existing (gt, hyp) correspondence while it stays
    within the threshold, even if a CLOSER new hypothesis appears — no
    switch, the closer hypothesis becomes an FP."""
    from kinet_tpu.utils.mot_metrics import MOTAccumulator

    acc = MOTAccumulator()
    g = [[0, 0, 10, 10]]
    a_near = [[1, 0, 10, 10]]  # IoU ~0.82 -> dist ~0.18
    acc.update([1], ["A"], _dist(g, a_near))
    # frame 1: A drifted (dist ~0.33, still within 0.5), B nearly perfect
    a_far = [[2, 0, 10, 10]]
    b_close = [[0.5, 0, 10, 10]]
    acc.update([1], ["A", "B"], _dist(g, [a_far[0], b_close[0]]))
    m = acc.metrics()
    assert m["num_switches"] == 0, m
    assert m["num_matches"] == 2
    assert m["num_false_positives"] == 1  # B
    assert m["num_misses"] == 0


def test_switch_counted_across_gap():
    """A gt that re-matches a DIFFERENT hyp after a gap still counts a
    switch (last known match is remembered across frames)."""
    from kinet_tpu.utils.mot_metrics import MOTAccumulator

    acc = MOTAccumulator()
    g = [[0, 0, 10, 10]]
    acc.update([1], ["A"], _dist(g, g))
    acc.update([1], [], _dist(g, []))  # miss
    acc.update([1], ["B"], _dist(g, g))  # re-acquired by B
    m = acc.metrics()
    assert m["num_switches"] == 1, m
    assert m["num_misses"] == 1


def test_fragmentation_counting():
    """tracked -> lost -> re-tracked = one fragmentation (even with the
    SAME id, which is not a switch)."""
    from kinet_tpu.utils.mot_metrics import MOTAccumulator

    acc = MOTAccumulator()
    g = [[0, 0, 10, 10]]
    acc.update([1], ["A"], _dist(g, g))
    acc.update([1], [], _dist(g, []))
    acc.update([1], ["A"], _dist(g, g))
    m = acc.metrics()
    assert m["num_fragmentations"] == 1, m
    assert m["num_switches"] == 0
    # 2/3 tracked -> partially tracked
    assert m["mostly_tracked"] == 0
    assert m["partially_tracked"] == 1
    assert m["mostly_lost"] == 0


def test_mostly_tracked_and_lost():
    from kinet_tpu.utils.mot_metrics import MOTAccumulator

    acc = MOTAccumulator()
    g1 = [0, 0, 10, 10]
    g2 = [100, 100, 10, 10]
    for _ in range(3):
        # g1 always matched, g2 never
        acc.update([1, 2], ["A"], _dist([g1, g2], [g1]))
    m = acc.metrics()
    assert m["mostly_tracked"] == 1
    assert m["mostly_lost"] == 1
    assert m["partially_tracked"] == 0
    assert m["num_misses"] == 3
