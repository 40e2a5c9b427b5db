"""MOTS GT -> COCO(RLE) converter round-trip: raw MOTS gt.txt ->
generate_coco_from_mots -> MOT dataset with decoded masks -> collate ->
one mask train step (reference generate_coco_from_mot.py mots branch +
load_mots_gt)."""
import configparser
import json
import os

import numpy as np
import pytest
from PIL import Image

from kinet_tpu.config import load_config
from kinet_tpu.tools.generate_coco_from_mot import generate_coco_from_mots
from kinet_tpu.utils.rle import mask_to_rle, rle_to_mask


@pytest.fixture(scope="module")
def synthetic_mots(tmp_path_factory):
    root = tmp_path_factory.mktemp("mots")
    seq = "MOTS20-02"
    h, w, n_frames = 64, 96, 3
    seq_dir = root / "train" / seq
    (seq_dir / "img1").mkdir(parents=True)
    (seq_dir / "gt").mkdir(parents=True)

    cfgp = configparser.ConfigParser()
    cfgp["Sequence"] = {
        "name": seq, "imDir": "img1", "frameRate": "30",
        "seqLength": str(n_frames), "imWidth": str(w), "imHeight": str(h),
        "imExt": ".jpg",
    }
    with open(seq_dir / "seqinfo.ini", "w") as fh:
        cfgp.write(fh)

    rng = np.random.default_rng(0)
    lines = []
    for f in range(1, n_frames + 1):
        img = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        Image.fromarray(img).save(seq_dir / "img1" / f"{f:06d}.jpg")
        # the MOT dataset resolves file_name directly under img_folder
        Image.fromarray(img).save(root / "train" / f"{seq}_{f:06d}.jpg")
        # two moving pedestrians (class 2) + one ignore region (id 10000)
        for inst, x0 in ((1, 10 + 2 * f), (2, 50 + 2 * f)):
            m = np.zeros((h, w), np.uint8)
            m[20:40, x0 : x0 + 12] = 1
            rle = mask_to_rle(m)
            lines.append(f"{f} {2000 + inst} 2 {h} {w} {rle['counts']}")
        m_ign = np.zeros((h, w), np.uint8)
        m_ign[0:8, 0:8] = 1
        lines.append(f"{f} 10000 10 {h} {w} {mask_to_rle(m_ign)['counts']}")
    (seq_dir / "gt" / "gt.txt").write_text("\n".join(lines) + "\n")
    return str(root), seq, (h, w)


def test_converter_schema_and_rle_roundtrip(synthetic_mots):
    root, seq, (h, w) = synthetic_mots
    coco = generate_coco_from_mots(root)
    assert coco["sequences"] == [seq]
    assert len(coco["images"]) == 3
    anns = coco["annotations"]
    # 2 pedestrians + 1 ignore per frame
    assert len(anns) == 9
    ped = [a for a in anns if not a["ignore"]]
    ign = [a for a in anns if a["ignore"]]
    assert len(ped) == 6 and len(ign) == 3
    assert {a["track_id"] for a in ped} == {1, 2}
    for a in ped:
        m = rle_to_mask(a["segmentation"]["counts"], (h, w))
        assert int(m.sum()) == 20 * 12
        x, y, bw, bh = a["bbox"]
        assert (bh, bw) == (20, 12)
        ys, xs = m.nonzero()
        assert (y, x) == (ys.min(), xs.min())


def test_mots_dataset_and_mask_train_step(synthetic_mots, tmp_path):
    import jax

    from kinet_tpu.data.loader import collate_tracking
    from kinet_tpu.data.mot import MOT
    from kinet_tpu.engine.state import TrainState, build_optimizer
    from kinet_tpu.engine.train_step import make_train_step
    from kinet_tpu.models.build import build_model

    root, seq, (h, w) = synthetic_mots
    ann_file = tmp_path / "mots_train.json"
    ann_file.write_text(json.dumps(generate_coco_from_mots(root)))

    cfg = load_config("train.yaml", named=["train_mots20"]).replace(
        dataset="mot", backbone="resnet_test", hidden_dim=32, nheads=2,
        enc_layers=1, dec_layers=1, dim_feedforward=32, num_queries=6,
        max_track_queries=4, max_objects=4, dropout=0.0, tracking=True,
        aux_loss=False,
        **{"img_transform.max_size": 128, "img_transform.val_width": 64},
    )
    ds = MOT(
        img_folder=os.path.join(root, "train"),
        ann_file=str(ann_file),
        split="train",
        img_transform=cfg.img_transform,
        prev_frame=True,
        prev_frame_range=1,
    )
    sample = ds[1]
    assert "masks" in sample["target"], sorted(sample["target"])
    assert sample["target"]["masks"].shape[0] == len(sample["target"]["boxes"])
    assert sample["target"]["masks"].sum() > 0

    batch_dict = collate_tracking(
        [sample], buckets=((128, 128),), max_objects=4,
        num_track_queries=4, hidden_dim=32,
    )
    targets = batch_dict["target"]
    assert targets.masks is not None
    assert targets.masks.shape[:2] == (1, 4)

    model, criterion, _ = build_model(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch_dict["image"], targets
    )
    tx = build_optimizer(cfg, params, steps_per_epoch=10)
    state = TrainState.create(params, tx)
    step = make_train_step(model, criterion, tx, cfg)
    state, losses = step(
        state, jax.random.PRNGKey(1), batch_dict["image"], targets,
        batch_dict["prev_image"], batch_dict["prev_target"],
    )
    assert "loss_mask" in losses and np.isfinite(float(losses["loss_mask"]))
    assert "loss_dice" in losses and np.isfinite(float(losses["loss_dice"]))
    assert np.isfinite(float(losses["loss"]))
