"""Named-config completeness: every reference named config composes and its
dataset name dispatches (reference registers them at src/train.py:24-38;
contents cfgs/*.yaml; null-train_split semantics mot.py:595-630)."""
import json

import numpy as np
import pytest
from PIL import Image

from kinet_tpu.config import load_config
from kinet_tpu.data.builder import build_dataset
from kinet_tpu.data.coco import CocoDetection
from kinet_tpu.data.mot import WeightedConcatDataset

ALL_TRAIN_NAMED = [
    "train_deformable", "train_tracking", "train_multi_frame",
    "train_full_res", "train_detr", "train_mot17", "train_crowdhuman",
    "train_mot17_crowdhuman", "train_mot20_crowdhuman",
    "train_mot_coco_person", "train_coco_person_masks", "train_mots20",
    "train_kinet", "train_kinet2",
]


@pytest.mark.parametrize("name", ALL_TRAIN_NAMED)
def test_train_named_config_composes(name):
    cfg = load_config("train.yaml", named=[name])
    # every composition keeps the base keys and yields a dispatchable dataset
    assert cfg.dataset in {
        "coco", "coco_person", "mot", "mot_kine", "crowdhuman",
        "mot_crowdhuman", "mot_coco_person", "coco_panoptic",
    }
    assert "hidden_dim" in cfg and "img_transform" in cfg


def test_mot20_crowdhuman_values():
    cfg = load_config("train.yaml", named=["train_mot20_crowdhuman"])
    assert cfg.dataset == "mot_crowdhuman"
    assert cfg.crowdhuman_train_split == "train_val"
    assert cfg.mot_path_train.endswith("MOT20")
    assert cfg.epochs == 50 and cfg.lr_drop == 10


def test_coco_person_masks_values():
    cfg = load_config("train.yaml", named=["train_coco_person_masks"])
    assert cfg.dataset == "coco_person"
    assert cfg.masks is True and cfg.freeze_detr is True
    assert cfg.load_mask_head_from_model
    assert cfg.lr == 1e-4


def test_track_reid_composes_deep_merge():
    base = load_config("track.yaml")
    cfg = load_config("track.yaml", named=["track_reid"])
    assert cfg.tracker_cfg.inactive_patience == 5
    # deep merge: the sibling tracker_cfg keys survive the delta
    for k in base.tracker_cfg.to_dict():
        if k != "inactive_patience":
            assert cfg.tracker_cfg.get(k) == base.tracker_cfg.get(k)


def _write_coco(img_dir, ann_path, n=2, seq=None):
    img_dir.mkdir(parents=True, exist_ok=True)
    ann_path.parent.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(n):
        fname = f"im{i:04d}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (64, 96, 3)).astype(np.uint8)
        ).save(img_dir / fname)
        rec = {"id": i, "file_name": fname, "height": 64, "width": 96}
        if seq:
            rec.update(
                frame_id=i, first_frame_image_id=0, seq_length=n, seq=seq
            )
        images.append(rec)
        annotations.append(
            {
                "id": i, "image_id": i, "category_id": 1,
                "bbox": [10 + 4 * i, 12, 18, 30], "area": 540,
                "iscrowd": 0, **({"track_id": 1} if seq else {}),
            }
        )
    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "person"}],
        **({"sequences": [seq]} if seq else {}),
    }
    with open(ann_path, "w") as f:
        json.dump(coco, f)


@pytest.fixture()
def data_roots(tmp_path):
    coco_root = tmp_path / "coco"
    _write_coco(
        coco_root / "train2017",
        coco_root / "annotations" / "person_keypoints_train2017.json",
    )
    ch_root = tmp_path / "crowdhuman"
    _write_coco(
        ch_root / "train_val", ch_root / "annotations" / "train_val.json"
    )
    mot_root = tmp_path / "mot"
    _write_coco(
        mot_root / "train",
        mot_root / "annotations" / "mot20_train_coco.json",
        n=3, seq="SEQ-01",
    )
    return dict(
        coco_path=str(coco_root), crowdhuman_path=str(ch_root),
        mot_path_train=str(mot_root), mot_path_val=str(mot_root),
    )


def test_mot_coco_person_dispatch_null_split(data_roots):
    # train_mot_coco_person sets train_split null -> COCO persons alone
    cfg = load_config("train.yaml", named=["train_mot_coco_person"]).replace(
        **data_roots
    )
    assert cfg.train_split is None
    ds = build_dataset("train", cfg)
    assert isinstance(ds, CocoDetection)
    assert len(ds) == 2


def test_mot_coco_person_dispatch_concat(data_roots):
    cfg = load_config("train.yaml", named=["train_mot_coco_person"]).replace(
        train_split="mot20_train_coco", **data_roots
    )
    ds = build_dataset("train", cfg)
    assert isinstance(ds, WeightedConcatDataset)
    assert len(ds) == 5  # 3 MOT frames + 2 COCO images


def test_mot20_crowdhuman_dispatch(data_roots):
    cfg = load_config("train.yaml", named=["train_mot20_crowdhuman"]).replace(
        **data_roots
    )
    ds = build_dataset("train", cfg)
    assert isinstance(ds, WeightedConcatDataset)
    assert len(ds) == 5  # 3 MOT20 frames + 2 CrowdHuman train_val images

    # null train_split -> CrowdHuman alone (reference mot.py:603-604)
    ds = build_dataset("train", cfg.replace(train_split=None))
    assert isinstance(ds, CocoDetection)
    assert len(ds) == 2
