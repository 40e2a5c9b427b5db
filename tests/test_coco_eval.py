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
