"""Dataset-level panoptic pipeline test: raw COCO-panoptic files (id-map
PNGs + json) -> CocoPanoptic dataset -> postprocess_panoptic ->
PanopticEvaluator PQ — closing the PARITY.md 'no dataset-level test' gap.
Reference surfaces: datasets/coco_panoptic.py, detr_segmentation.py:256-388,
datasets/panoptic_eval.py:13-46.
"""
import json

import numpy as np
import pytest
from PIL import Image

from kinet_tpu.data.coco_panoptic import CocoPanoptic, id2rgb, rgb2id
from kinet_tpu.models.panoptic import (
    PanopticEvaluator,
    panoptic_quality,
    postprocess_panoptic,
)

H, W = 48, 64


def _seg_layout(i):
    """Image i: a 'thing' rectangle + 'stuff' background split in two."""
    id_map = np.zeros((H, W), np.int64)
    id_map[:, :] = 7  # stuff: sky
    id_map[30:, :] = 9  # stuff: ground
    x = 10 + 6 * i
    id_map[12:32, x : x + 14] = 21  # thing: person
    segments = [
        {"id": 7, "category_id": 2, "iscrowd": 0, "area": int((id_map == 7).sum())},
        {"id": 9, "category_id": 3, "iscrowd": 0, "area": int((id_map == 9).sum())},
        {"id": 21, "category_id": 1, "iscrowd": 0, "area": int((id_map == 21).sum())},
    ]
    return id_map, segments


@pytest.fixture(scope="module")
def panoptic_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("panoptic")
    (root / "imgs").mkdir()
    (root / "panoptic_train").mkdir()
    images, annotations = [], []
    for i in range(2):
        id_map, segments = _seg_layout(i)
        fname = f"{i:06d}.jpg"
        png = f"{i:06d}.png"
        rgb = np.zeros((H, W, 3), np.uint8)
        rgb[..., 0] = 40 + 10 * i
        Image.fromarray(rgb).save(root / "imgs" / fname)
        Image.fromarray(id2rgb(id_map)).save(root / "panoptic_train" / png)
        images.append(
            {"id": i, "file_name": fname, "height": H, "width": W}
        )
        annotations.append(
            {"image_id": i, "file_name": png, "segments_info": segments}
        )
    with open(root / "panoptic_train.json", "w") as f:
        json.dump(
            {
                "images": images,
                "annotations": annotations,
                "categories": [
                    {"id": 1, "name": "person", "isthing": 1},
                    {"id": 2, "name": "sky", "isthing": 0},
                    {"id": 3, "name": "ground", "isthing": 0},
                ],
            },
            f,
        )
    return root


def test_rgb_id_roundtrip():
    ids = np.array([[0, 255, 256, 70000]], np.int64)
    assert (rgb2id(id2rgb(ids)) == ids).all()


def test_coco_panoptic_dataset(panoptic_root):
    ds = CocoPanoptic(
        str(panoptic_root / "imgs"),
        str(panoptic_root / "panoptic_train"),
        str(panoptic_root / "panoptic_train.json"),
        split="val",
        img_transform=None,
    )
    assert len(ds) == 2
    item = ds[0]
    img, target = item["image"], item["target"]
    assert target["masks"].shape[0] == 3
    assert set(np.asarray(target["labels"]).tolist()) == {1, 2, 3}
    # masks are exclusive and cover the full image
    total = np.asarray(target["masks"]).sum(0)
    assert (total == 1).all()
    # the thing box matches the rectangle extent (normalized cxcywh is
    # scale-invariant under the val resize)
    k = np.asarray(target["labels"]).tolist().index(1)
    boxes = np.asarray(target["boxes"])
    assert abs(boxes[k, 2] - 14 / W) < 0.02


def test_panoptic_postprocess_and_pq(panoptic_root):
    is_thing = {0: True, 1: False, 2: False}  # model label -> isthing
    gt_pairs, preds_perfect, preds_missing = [], [], []
    for i in range(2):
        id_map, segments = _seg_layout(i)
        gt_pairs.append(
            (id_map, [
                {"id": s["id"], "category_id": s["category_id"]}
                for s in segments
            ])
        )
        # model outputs that reproduce the GT: 3 confident queries (model
        # labels are category_id - 1), one background query
        logits = np.full((4, 4), -8.0, np.float32)  # 3 classes + no-object
        mask_logits = np.full((4, H, W), -8.0, np.float32)
        for q, seg in enumerate(segments):
            logits[q, seg["category_id"] - 1] = 8.0
            mask_logits[q][id_map == seg["id"]] = 8.0
        logits[3, 3] = 8.0  # no-object query
        seg_map, info = postprocess_panoptic(logits, mask_logits, is_thing)
        # remap categories back to dataset ids for scoring
        preds_perfect.append(
            (seg_map, [
                {"id": s["id"], "category_id": s["category_id"] + 1}
                for s in info
            ])
        )
        # degraded: drop the thing query entirely
        logits2 = logits.copy()
        logits2[np.argmax(logits[:, 0])] = [-8, -8, -8, 8]
        seg_map2, info2 = postprocess_panoptic(logits2, mask_logits, is_thing)
        preds_missing.append(
            (seg_map2, [
                {"id": s["id"], "category_id": s["category_id"] + 1}
                for s in info2
            ])
        )

    ev = PanopticEvaluator(gt_pairs=gt_pairs)
    ev.update(preds_perfect)
    ev.synchronize_between_processes()
    stats = ev.summarize()
    assert stats["pq"] > 0.99, stats
    assert stats["fp"] == 0 and stats["fn"] == 0

    # dropping the thing query: 2 FNs (one per image), stuff still matches
    stats2 = panoptic_quality(gt_pairs, preds_missing)
    assert stats2["fn"] == 2 and stats2["tp"] == 4, stats2
    expected_rq = 4 / (4 + 0.5 * 2)
    assert abs(stats2["rq"] - expected_rq) < 1e-6
