"""COCO AP evaluator sanity tests on constructed scenarios."""
import json

import numpy as np
import pytest

from kinet_tpu.data.coco import CocoIndex
from kinet_tpu.utils.coco_eval import CocoEvaluator


@pytest.fixture
def gt_index(tmp_path):
    d = {
        "images": [
            {"id": 1, "height": 200, "width": 200, "file_name": "a.jpg"},
            {"id": 2, "height": 200, "width": 200, "file_name": "b.jpg"},
        ],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 50],
             "area": 2500, "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 1, "bbox": [100, 100, 40, 40],
             "area": 1600, "iscrowd": 0},
            {"id": 3, "image_id": 2, "category_id": 1, "bbox": [20, 20, 60, 60],
             "area": 3600, "iscrowd": 0},
        ],
        "categories": [{"id": 1, "name": "person"}],
    }
    p = tmp_path / "gt.json"
    p.write_text(json.dumps(d))
    return CocoIndex(str(p))


def test_perfect_detections(gt_index):
    ev = CocoEvaluator(gt_index)
    ev.update(
        {
            1: {
                "boxes": np.array([[10, 10, 60, 60], [100, 100, 140, 140]]),
                "scores": np.array([0.9, 0.8]),
                "labels": np.array([0, 0]),
            },
            2: {
                "boxes": np.array([[20, 20, 80, 80]]),
                "scores": np.array([0.95]),
                "labels": np.array([0]),
            },
        }
    )
    ev.accumulate()
    stats = ev.summarize()
    assert stats[0] == pytest.approx(1.0, abs=0.02)  # mAP
    assert stats[1] == pytest.approx(1.0, abs=0.02)  # AP50


def test_missed_and_false_positive(gt_index):
    ev = CocoEvaluator(gt_index)
    ev.update(
        {
            1: {
                # one perfect, one FP in empty space
                "boxes": np.array([[10, 10, 60, 60], [150, 150, 190, 190]]),
                "scores": np.array([0.9, 0.8]),
                "labels": np.array([0, 0]),
            },
            2: {"boxes": np.zeros((0, 4)), "scores": np.zeros(0),
                "labels": np.zeros(0, np.int64)},
        }
    )
    ev.accumulate()
    stats = ev.summarize()
    assert 0.0 < stats[1] < 0.75  # recall capped at 1/3 + FP precision hit


def test_localization_quality_affects_high_iou(gt_index):
    ev = CocoEvaluator(gt_index)
    # boxes shifted ~8-12%: IoU ≈ .68-.73 -> pass at .5, fail at .75
    ev.update(
        {
            1: {
                "boxes": np.array([[14, 14, 64, 64], [104, 104, 144, 144]]),
                "scores": np.array([0.9, 0.8]),
                "labels": np.array([0, 0]),
            },
            2: {
                "boxes": np.array([[26, 26, 86, 86]]),
                "scores": np.array([0.95]),
                "labels": np.array([0]),
            },
        }
    )
    ev.accumulate()
    stats = ev.summarize()
    assert stats[1] > 0.9  # AP50 fine
    assert stats[2] < 0.5  # AP75 degraded
    assert stats[0] < stats[1]


# ---------------------------------------------------------------------------
# Adversarial pycocotools-semantics oracles (hand-computed expected values)
# ---------------------------------------------------------------------------
def _index(tmp_path, images, annotations, name="gt_adv.json"):
    d = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "person"}],
    }
    p = tmp_path / name
    p.write_text(json.dumps(d))
    return CocoIndex(str(p))


def _img(i, hw=600):
    return {"id": i, "height": hw, "width": hw, "file_name": f"{i}.jpg"}


def _ann(aid, img, bbox, crowd=0):
    return {
        "id": aid, "image_id": img, "category_id": 1, "bbox": bbox,
        "area": bbox[2] * bbox[3], "iscrowd": crowd,
    }


def test_crowd_gt_neither_tp_nor_fp(tmp_path):
    """A detection matching a crowd GT is removed from the PR sweep
    entirely (pycocotools gtIg semantics). Expected AP hand-computed:
    sweep = [TP(.9), FP(.75), TP(.7)] -> rec [.5,.5,1], prec envelope
    [1, 2/3] -> AP = (51*1 + 50*(2/3)) / 101 = 253/303."""
    gt = _index(
        tmp_path,
        [_img(1)],
        [
            _ann(1, 1, [10, 10, 50, 50]),
            _ann(2, 1, [100, 100, 50, 50], crowd=1),
            _ann(3, 1, [300, 300, 50, 50]),
        ],
    )
    ev = CocoEvaluator(gt)
    ev.update(
        {
            1: {
                "boxes": np.array(
                    [
                        [10, 10, 60, 60],      # TP on g1, 0.9
                        [100, 100, 150, 150],  # exact crowd hit, 0.8
                        [500, 500, 550, 550],  # pure FP, 0.75
                        [300, 300, 350, 350],  # TP on g3, 0.7
                    ],
                    float,
                ),
                "scores": np.array([0.9, 0.8, 0.75, 0.7]),
                "labels": np.array([0, 0, 0, 0]),
            }
        }
    )
    ev.accumulate()
    stats = ev.summarize()
    expect = 253.0 / 303.0
    assert abs(stats[0] - expect) < 1e-9, stats[0]  # mAP
    assert abs(stats[1] - expect) < 1e-9, stats[1]  # AP50
    assert abs(stats[8] - 1.0) < 1e-9  # AR100: both real GT found


def test_crowd_listed_first_still_prefers_real_gt(tmp_path):
    """GT must be sorted ignored-last before matching: a det overlapping a
    crowd PERFECTLY (IoU 1.0) and a real GT at IoU 0.92 matches the REAL
    GT at thresholds <= 0.9 (9/10 thrs AP=1) and the crowd (ignored) at
    0.95 -> mAP = 0.9."""
    gt = _index(
        tmp_path,
        [_img(1)],
        [
            _ann(1, 1, [11, 11, 50, 50], crowd=1),  # crowd FIRST
            _ann(2, 1, [10, 10, 50, 50]),
        ],
    )
    ev = CocoEvaluator(gt)
    ev.update(
        {
            1: {
                "boxes": np.array([[11, 11, 61, 61]], float),
                "scores": np.array([0.9]),
                "labels": np.array([0]),
            }
        }
    )
    ev.accumulate()
    stats = ev.summarize()
    assert abs(stats[0] - 0.9) < 1e-9, stats[0]
    assert abs(stats[1] - 1.0) < 1e-9, stats[1]


def test_maxdets_tiers(tmp_path):
    """AR@1 truncates to the single best-scoring det per image."""
    gt = _index(
        tmp_path,
        [_img(1)],
        [
            _ann(1, 1, [10, 10, 50, 50]),
            _ann(2, 1, [100, 100, 50, 50]),
            _ann(3, 1, [300, 300, 50, 50]),
        ],
    )
    ev = CocoEvaluator(gt)
    ev.update(
        {
            1: {
                "boxes": np.array(
                    [
                        [10, 10, 60, 60],
                        [100, 100, 150, 150],
                        [300, 300, 350, 350],
                    ],
                    float,
                ),
                "scores": np.array([0.9, 0.8, 0.7]),
                "labels": np.array([0, 0, 0]),
            }
        }
    )
    ev.accumulate()
    stats = ev.summarize()
    assert abs(stats[0] - 1.0) < 1e-9  # mAP perfect
    assert abs(stats[6] - 1.0 / 3.0) < 1e-9, stats[6]  # AR@1
    assert abs(stats[7] - 1.0) < 1e-9  # AR@10
    assert abs(stats[8] - 1.0) < 1e-9  # AR@100


def test_duplicate_detection_is_fp(tmp_path):
    """Second det on an already-matched GT counts as FP mid-sweep:
    [TP(.9), dupFP(.8), TP(.7)] -> AP = 253/303 (same curve as the crowd
    case)."""
    gt = _index(
        tmp_path,
        [_img(1)],
        [_ann(1, 1, [10, 10, 50, 50]), _ann(2, 1, [300, 300, 50, 50])],
    )
    ev = CocoEvaluator(gt)
    ev.update(
        {
            1: {
                "boxes": np.array(
                    [
                        [10, 10, 60, 60],
                        [10, 10, 60, 60],      # duplicate, lower score
                        [300, 300, 350, 350],
                    ],
                    float,
                ),
                "scores": np.array([0.9, 0.8, 0.7]),
                "labels": np.array([0, 0, 0]),
            }
        }
    )
    ev.accumulate()
    stats = ev.summarize()
    expect = 253.0 / 303.0
    assert abs(stats[0] - expect) < 1e-9, stats[0]


def test_area_range_gating(tmp_path):
    """APs sees only small GT; a large det unmatched in the small range is
    area-ignored, not an FP. No medium GT -> APm = -1."""
    gt = _index(
        tmp_path,
        [_img(1)],
        [
            _ann(1, 1, [10, 10, 20, 20]),    # small (400 px)
            _ann(2, 1, [40, 40, 150, 150]),  # large (22500 px)
        ],
    )
    ev = CocoEvaluator(gt)
    ev.update(
        {
            1: {
                "boxes": np.array(
                    [[10, 10, 30, 30], [40, 40, 190, 190]], float
                ),
                "scores": np.array([0.9, 0.8]),
                "labels": np.array([0, 0]),
            }
        }
    )
    ev.accumulate()
    stats = ev.summarize()
    assert abs(stats[0] - 1.0) < 1e-9
    assert abs(stats[3] - 1.0) < 1e-9, stats[3]  # APs
    assert stats[4] == -1.0, stats[4]  # APm: no medium GT
    assert abs(stats[5] - 1.0) < 1e-9, stats[5]  # APl


def test_golden_map_sweep_mid_iou_with_crowd(tmp_path):
    """GOLDEN multi-threshold sweep (VERDICT r4 #7): expected mAP@[.5:.95]
    hand-derived from the pycocotools algorithm (greedy per-score matching,
    crowd-ignore, right-max precision envelope, 101-point interpolation,
    mean over the 10 IoU thresholds).

    GT: g1=[0,0,10,10], g2=[20,20,10,10], crowd c=[40,40,10,10].
    Dets (category 0->1): d1=g1 exactly (0.9) -> TP at every t;
    d2=[22,20,10,10] (0.8) vs g2: inter 8x10=80, union 120 -> IoU 2/3,
    TP for t in {.5,.55,.6,.65}, FP for t >= .7; d3=c exactly (0.7) ->
    crowd-ignored (pycocotools crowd IoU = inter/det-area = 1.0) at every
    t; d4=[60,60,10,10] (0.6) -> FP at every t.

    Per-threshold AP over 2 real GT:
      t <= .65: sweep TP,TP,FP -> rec [.5, 1, 1], prec [1, 1, 2/3];
                envelope 1.0 everywhere -> AP = 1.
      t >= .7:  sweep TP,FP,FP -> rec caps at .5; envelope 1.0 up to
                rec .5, 0 beyond -> AP = 51/101.
    mAP = (4*1 + 6*51/101)/10 = (4 + 306/101)/10."""
    gt = _index(
        tmp_path,
        [_img(1)],
        [
            _ann(1, 1, [0, 0, 10, 10]),
            _ann(2, 1, [20, 20, 10, 10]),
            _ann(3, 1, [40, 40, 10, 10], crowd=1),
        ],
    )
    ev = CocoEvaluator(gt)
    ev.update(
        {
            1: {
                "boxes": np.array(
                    [
                        [0, 0, 10, 10],     # d1: exact g1
                        [22, 20, 32, 30],   # d2: IoU 2/3 vs g2
                        [40, 40, 50, 50],   # d3: exact crowd
                        [60, 60, 70, 70],   # d4: pure FP
                    ],
                    float,
                ),
                "scores": np.array([0.9, 0.8, 0.7, 0.6]),
                "labels": np.array([0, 0, 0, 0]),
            }
        }
    )
    ev.accumulate()
    stats = ev.summarize()
    expect_map = (4 * 1.0 + 6 * (51.0 / 101.0)) / 10.0
    assert abs(stats[0] - expect_map) < 1e-9, stats[0]   # mAP@[.5:.95]
    assert abs(stats[1] - 1.0) < 1e-9, stats[1]          # AP50
    assert abs(stats[2] - 51.0 / 101.0) < 1e-9, stats[2]  # AP75
