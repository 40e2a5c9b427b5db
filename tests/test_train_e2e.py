"""End-to-end training session: synthetic MOT-style COCO data on disk ->
engine.train (loader, weighted sampler, jitted tracking train step,
checkpointing). Debug mode: 2 steps per epoch, 1 epoch."""
import json
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from kinet_tpu.config import load_config
from kinet_tpu.engine.train import train


@pytest.fixture(scope="module")
def synthetic_mot_coco(tmp_path_factory):
    root = tmp_path_factory.mktemp("motdata")
    img_dir = root / "train"
    ann_dir = root / "annotations"
    img_dir.mkdir()
    ann_dir.mkdir()
    rng = np.random.default_rng(0)
    n_frames = 6
    images, annotations = [], []
    aid = 0
    for f in range(n_frames):
        fname = f"SEQ-01_{f + 1:06d}.jpg"
        arr = rng.integers(0, 255, (64, 96, 3)).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / fname)
        images.append(
            {
                "id": f, "file_name": fname, "height": 64, "width": 96,
                "frame_id": f, "first_frame_image_id": 0,
                "seq_length": n_frames, "seq": "SEQ-01",
            }
        )
        for tid in (1, 2):
            x = 10 + 4 * f + 20 * tid
            annotations.append(
                {
                    "id": aid, "image_id": f, "category_id": 1,
                    "bbox": [x, 12, 18, 30], "area": 540, "iscrowd": 0,
                    "track_id": tid,
                }
            )
            aid += 1
    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "person"}],
        "sequences": ["SEQ-01"],
    }
    with open(ann_dir / "train.json", "w") as fh:
        json.dump(coco, fh)
    with open(ann_dir / "val.json", "w") as fh:
        json.dump(coco, fh)
    return str(root)


def test_train_session(synthetic_mot_coco, tmp_path):
    cfg = load_config("train.yaml", named=["train_tracking"]).replace(
        dataset="mot",
        mot_path_train=synthetic_mot_coco,
        mot_path_val=synthetic_mot_coco,
        backbone="resnet_test",
        hidden_dim=32, nheads=2, enc_layers=1, dec_layers=1,
        dim_feedforward=32, num_queries=8, max_objects=6,
        max_track_queries=6, dropout=0.0, batch_size=2,
        epochs=1, num_workers=1, debug=True, val_interval=0,
        tracking_eval=False, aux_loss=False,
        output_dir=str(tmp_path / "out"),
        **{"img_transform.max_size": 128, "img_transform.val_width": 64,
           "size_buckets": [[64, 96], [96, 128]], "log_interval": 1},
    )
    state = train(cfg)
    assert int(state.step) >= 1
    # checkpoint + config written
    assert osp.exists(tmp_path / "out" / "config.yaml")
    assert osp.exists(tmp_path / "out" / "checkpoint")


def test_kine_train_session(synthetic_mot_coco, tmp_path):
    """KineT training path: mot_kine dataset -> kine collate -> trail
    augmentation -> encoder-only model -> update."""
    import json as _json
    import numpy as np

    # build a det json next to the gt json
    ann_dir = osp.join(synthetic_mot_coco, "annotations")
    with open(osp.join(ann_dir, "train.json")) as f:
        gt = _json.load(f)
    dets = {
        "images": gt["images"],
        "annotations": [
            {**a, "id": i, "confidence": 0.9}
            for i, a in enumerate(gt["annotations"])
        ],
        "categories": gt["categories"],
        "sequences": gt["sequences"],
    }
    with open(osp.join(ann_dir, "det_train.json"), "w") as f:
        _json.dump(dets, f)

    cfg = load_config("train.yaml", named=["train_kinet2"]).replace(
        dataset="mot_kine",
        mot_path_train=synthetic_mot_coco,
        mot_path_val=synthetic_mot_coco,
        hidden_dim=32, nheads=2, dim_feedforward=32,
        max_objects=6, max_number_detection=8, max_track_queries=6,
        track_prev_frame_range=2, encoding_dim_tracklets=4, use_encoding_tracklets=True,
        dropout=0.0, batch_size=2, epochs=1, num_workers=1, debug=True,
        val_interval=0, tracking=True, tracking_eval=False,
        output_dir=str(tmp_path / "kine_out"),
        **{"log_interval": 1},
    )
    state = train(cfg)
    assert int(state.step) >= 1


def test_evaluate_detection(synthetic_mot_coco):
    """During-training evaluation: AP over the synthetic val set with real
    image ids (reference engine.py:179-278)."""
    import jax
    import jax.numpy as jnp

    from kinet_tpu.data import build_dataset
    from kinet_tpu.engine.evaluate import evaluate
    from kinet_tpu.models.build import build_model
    from kinet_tpu.structs import ImageBatch, Targets

    cfg = load_config("train.yaml").replace(
        dataset="mot",
        mot_path_train=synthetic_mot_coco,
        mot_path_val=synthetic_mot_coco,
        backbone="resnet_test", hidden_dim=32, nheads=2, enc_layers=1,
        dec_layers=1, dim_feedforward=32, num_queries=8, max_objects=6,
        dropout=0.0, batch_size=2, num_workers=1, debug=True,
        tracking=False, tracking_eval=False, aux_loss=False,
        **{"img_transform.max_size": 128, "img_transform.val_width": 64,
           "size_buckets": [[64, 96], [96, 128]], "log_interval": 1},
    )
    model, criterion, post = build_model(cfg)
    ds = build_dataset("val", cfg)
    batch0 = ds[0]
    b = ImageBatch(
        images=jnp.asarray(batch0["image"][None]),
        pad_mask=jnp.zeros((1, *batch0["image"].shape[:2]), bool),
    )
    t = Targets.create(
        jnp.full((1, 2, 4), 0.5), jnp.zeros((1, 2), jnp.int32),
        jnp.ones((1, 2), bool), num_track_queries=0, hidden_dim=32,
    )
    params = model.init(jax.random.PRNGKey(0), b, t)
    stats = evaluate(model, criterion, post, params, ds, cfg)
    assert "coco_eval_bbox" in stats and len(stats["coco_eval_bbox"]) == 12
    # untrained model: AP may be ~0, but must be a valid number in [-1, 1]
    assert -1.0 <= stats["coco_eval_bbox"][0] <= 1.0


def test_preemption_checkpoints_and_returns(synthetic_mot_coco, tmp_path):
    """SIGTERM-equivalent preemption (reference run_with_submitit.py:53-67):
    with the preempt flag raised, the train loop finishes one step, saves
    a checkpoint, and returns early — the launcher's auto-resume then
    requeues from it."""
    from kinet_tpu.utils import preempt

    cfg = load_config("train.yaml", named=["train_tracking"]).replace(
        dataset="mot",
        mot_path_train=synthetic_mot_coco,
        mot_path_val=synthetic_mot_coco,
        backbone="resnet_test",
        hidden_dim=32, nheads=2, enc_layers=1, dec_layers=1,
        dim_feedforward=32, num_queries=8, max_objects=6,
        max_track_queries=6, dropout=0.0, batch_size=2,
        epochs=3, num_workers=1, debug=False, val_interval=0,
        tracking_eval=False, aux_loss=False,
        output_dir=str(tmp_path / "out"),
        **{"img_transform.max_size": 128, "img_transform.val_width": 64,
           "size_buckets": [[64, 96], [96, 128]], "log_interval": 1},
    )
    preempt.install()
    preempt.request()  # preempt before the loop: must stop after step 1
    try:
        state = train(cfg)
    finally:
        preempt.clear()
    assert int(state.step) == 1  # stopped mid-epoch, not after 3 epochs
    assert osp.exists(tmp_path / "out" / "checkpoint")
    # mid-epoch checkpoint records epoch-1: the requeued run must RE-RUN
    # the interrupted epoch 1 (load_for_resume restarts at epoch+1), not
    # skip its remaining steps (advisor round-2 medium finding)
    import orbax.checkpoint as ocp

    restored = ocp.PyTreeCheckpointer().restore(
        str((tmp_path / "out" / "checkpoint").resolve())
    )
    assert int(restored["epoch"]) == 0


def test_evaluate_with_tracking_eval(synthetic_mot_coco):
    """The in-process during-training tracking eval (reference
    engine.py:288-344 — broken upstream via the commented-out `ex` import,
    SURVEY §8.2; implemented as intended here): evaluate() runs a track
    session on mot_path_val with the live model and reports MOTA/IDF1."""
    import configparser

    import jax
    import jax.numpy as jnp

    from kinet_tpu.data import build_dataset
    from kinet_tpu.engine.evaluate import evaluate
    from kinet_tpu.models.build import build_model
    from kinet_tpu.structs import ImageBatch, Targets

    # a MOT17 sequence dir next to the COCO annotations (same frames)
    root = synthetic_mot_coco
    seq_dir = osp.join(root, "MOT17", "train", "MOT17-05-FRCNN")
    if not osp.exists(seq_dir):
        import shutil

        for d in ("img1", "gt", "det"):
            os_makedirs = __import__("os").makedirs
            os_makedirs(osp.join(seq_dir, d), exist_ok=True)
        __import__("os").makedirs(
            osp.join(root, "MOT17", "test"), exist_ok=True
        )
        gt_lines, det_lines = [], []
        for f in range(6):
            shutil.copy(
                osp.join(root, "train", f"SEQ-01_{f + 1:06d}.jpg"),
                osp.join(seq_dir, "img1", f"{f + 1:06d}.jpg"),
            )
            for tid in (1, 2):
                x = 10 + 4 * f + 20 * tid
                gt_lines.append(f"{f + 1},{tid},{x},12,18,30,1,1,1.0")
                det_lines.append(f"{f + 1},-1,{x},12,18,30,1.0,-1,-1")
        cfgp = configparser.ConfigParser()
        cfgp["Sequence"] = {
            "name": "MOT17-05-FRCNN", "imDir": "img1", "frameRate": "30",
            "seqLength": "6", "imWidth": "96", "imHeight": "64",
            "imExt": ".jpg",
        }
        with open(osp.join(seq_dir, "seqinfo.ini"), "w") as fh:
            cfgp.write(fh)
        with open(osp.join(seq_dir, "gt", "gt.txt"), "w") as fh:
            fh.write("\n".join(gt_lines) + "\n")
        with open(osp.join(seq_dir, "det", "det.txt"), "w") as fh:
            fh.write("\n".join(det_lines) + "\n")

    cfg = load_config("train.yaml", named=["train_tracking"]).replace(
        dataset="mot",
        mot_path_train=root, mot_path_val=root,
        backbone="resnet_test", hidden_dim=32, nheads=2, enc_layers=1,
        dec_layers=1, dim_feedforward=32, num_queries=8, max_objects=6,
        max_track_queries=8, dropout=0.0, batch_size=2, num_workers=1,
        debug=True, tracking=True, tracking_eval=True, aux_loss=False,
        tracking_eval_dataset="MOT17-05-FRCNN",
        **{"img_transform.max_size": 128, "img_transform.val_width": 64,
           "size_buckets": [[64, 96], [96, 128]], "log_interval": 1},
    )
    model, criterion, post = build_model(cfg)
    ds = build_dataset("val", cfg)
    b = ImageBatch(
        images=jnp.zeros((1, 64, 96, 3)),
        pad_mask=jnp.zeros((1, 64, 96), bool),
    )
    t = Targets.create(
        jnp.full((1, 2, 4), 0.5), jnp.zeros((1, 2), jnp.int32),
        jnp.ones((1, 2), bool), num_track_queries=8, hidden_dim=32,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), b, t)
    stats = evaluate(model, criterion, post, params, ds, cfg)
    assert "coco_eval_bbox" in stats
    # tracking eval ran and produced CLEAR-MOT numbers (untrained model:
    # values are poor but must be present and finite)
    assert "mota" in stats and "idf1" in stats
    assert np.isfinite(stats["mota"]) and np.isfinite(stats["idf1"])


def test_evaluate_kine_dataset(synthetic_mot_coco):
    """evaluate() on a KINE dataset (VERDICT r2 weak #3 / next #4): the
    reference's evaluate unconditionally unpacks image batches and would
    crash on kine val data (SURVEY §8.10); here the kine branch collates
    (detections, metadata, target) triples and scores COCO AP on the
    KineT model's associated boxes."""
    import json as _json

    import jax
    import jax.numpy as jnp
    import numpy as np

    from kinet_tpu.data import build_dataset
    from kinet_tpu.engine.evaluate import evaluate
    from kinet_tpu.models.build import build_model
    from kinet_tpu.structs import KineBatch, Targets
    from kinet_tpu.tracking.kine_augment import kine_track_embed_dims

    ann_dir = osp.join(synthetic_mot_coco, "annotations")
    with open(osp.join(ann_dir, "val.json")) as f:
        gt = _json.load(f)
    dets = {
        "images": gt["images"],
        "annotations": [
            {**a, "id": i, "confidence": 0.9}
            for i, a in enumerate(gt["annotations"])
        ],
        "categories": gt["categories"],
        "sequences": gt["sequences"],
    }
    with open(osp.join(ann_dir, "det_val.json"), "w") as f:
        _json.dump(dets, f)

    cfg = load_config("train.yaml", named=["train_kinet2"]).replace(
        dataset="mot_kine",
        mot_path_train=synthetic_mot_coco,
        mot_path_val=synthetic_mot_coco,
        hidden_dim=32, nheads=2, dim_feedforward=32,
        max_objects=6, max_number_detection=8, max_track_queries=6,
        track_prev_frame_range=2, encoding_dim_tracklets=4,
        use_encoding_tracklets=True,
        dropout=0.0, batch_size=2, num_workers=1, debug=True,
        tracking=True, tracking_eval=False,
        **{"log_interval": 1},
    )
    model, criterion, post = build_model(cfg)
    ds = build_dataset("val", cfg)
    # init params from one real sample's shapes
    d0, m0, t0 = ds[0]
    nd, mo = 8, 6
    kb0 = KineBatch(
        detections=jnp.zeros((1, nd, 4), jnp.float32),
        metadata=jnp.zeros((1, nd, m0.shape[-1]), jnp.float32),
        pad_mask=jnp.zeros((1, nd), bool),
    )
    tdim, mdim = kine_track_embed_dims(2, 4, m0.shape[-1])
    tg0 = Targets.create(
        jnp.full((1, mo, 4), 0.5), jnp.zeros((1, mo), jnp.int32),
        jnp.ones((1, mo), bool), num_track_queries=6, hidden_dim=tdim + mdim,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), kb0, tg0)
    stats = evaluate(model, criterion, post, params, ds, cfg)
    assert "coco_eval_bbox" in stats and len(stats["coco_eval_bbox"]) == 12
    assert -1.0 <= stats["coco_eval_bbox"][0] <= 1.0


def test_track_multihost_sequence_split(synthetic_mot_coco, monkeypatch):
    """Multi-host tracking eval (reference engine.py:291-304, 333-344):
    sequences are split round-robin over process_index, and the per-host
    accums are merged via all_gather before the summary — validated with a
    fake 2-process world (no real multi-host needed)."""
    from kinet_tpu.utils import dist

    # fake a 2-host world from the perspective of rank 0
    monkeypatch.setattr(dist, "get_world_size", lambda: 2)
    monkeypatch.setattr(dist, "get_rank", lambda: 0)
    gathered_payloads = []

    def fake_all_gather(obj, **kw):
        gathered_payloads.append(obj)
        # simulate the other rank contributing one accumulated sequence
        from kinet_tpu.utils.mot_metrics import MOTAccumulator

        other = MOTAccumulator()
        other.update([1], [1], np.zeros((1, 1)))
        return [obj, ([other], ["OTHER-SEQ"])]

    monkeypatch.setattr(dist, "all_gather_objects", fake_all_gather)

    class FakeSeq:
        def __init__(self, name):
            self.name = name
            self.no_gt = False
            self.data = [{"gt": {1: np.array([0, 0, 10, 10])}}]

        def __str__(self):
            return self.name

        def __len__(self):
            return 1

        def __getitem__(self, i):
            raise AssertionError("frames should not be read (results loaded)")

        def load_results(self, d):
            return {1: {0: {"bbox": np.array([0, 0, 10, 10, 1.0])}}}

    seqs = [FakeSeq(f"SEQ-{i:02d}") for i in range(4)]

    import kinet_tpu.engine.track as trk_engine

    monkeypatch.setattr(
        trk_engine, "TrackDatasetFactory", lambda *a, **k: seqs
    )

    # minimal config: model loading is skipped via obj_detector_model
    from kinet_tpu.config import load_config as _lc

    track_cfg = _lc("track.yaml").replace(
        data_root_dir=synthetic_mot_coco, output_dir="",
        load_results_dir="unused",
    )
    train_cfg = _lc("train.yaml").replace(tracking=True)

    class NoModel:
        def __call__(self, batch, targets):  # signature for make_forward_fn
            raise AssertionError("model must not run (results loaded)")

    summary = trk_engine.main_track(
        track_cfg, obj_detector_model=(NoModel(), {}, {}, train_cfg)
    )
    # rank 0 tracked only its round-robin half: SEQ-00, SEQ-02
    own_accums, own_names = gathered_payloads[0]
    assert own_names == ["SEQ-00", "SEQ-02"]
    # the summary covers rank 0's sequences AND the gathered remote one
    assert set(summary.keys()) >= {"SEQ-00", "SEQ-02", "OTHER-SEQ"}


def test_seeded_data_stream_is_reproducible(synthetic_mot_coco):
    """Two identically-seeded dataset+loader passes produce bit-identical
    batches (VERDICT r2 next #9): per-item augmentation seeds are a pure
    function of (construction seed, epoch, index), and the threaded loader
    re-sequences worker output deterministically."""
    import numpy as np

    from kinet_tpu.data import build_dataset
    from kinet_tpu.data.loader import DataLoader, RandomSampler

    cfg = load_config("train.yaml", named=["train_tracking"]).replace(
        dataset="mot",
        mot_path_train=synthetic_mot_coco,
        mot_path_val=synthetic_mot_coco,
        max_objects=6, max_track_queries=6,
        **{"img_transform.max_size": 128, "img_transform.val_width": 64,
           "size_buckets": [[64, 96], [96, 128]]},
    )

    def run_epochs():
        np.random.seed(11)
        ds = build_dataset("train", cfg)
        sampler = RandomSampler(ds, seed=11)
        loader = DataLoader(
            ds, batch_size=2, sampler=sampler, buckets=cfg.size_buckets,
            max_objects=6, num_track_queries=6, hidden_dim=32,
            num_workers=2,
        )
        out = []
        for epoch in (0, 1):
            sampler.set_epoch(epoch)
            ds.set_epoch(epoch)
            for batch in loader:
                out.append(
                    (
                        np.asarray(batch["image"].images).copy(),
                        np.asarray(batch["target"].boxes).copy(),
                    )
                )
        return out

    a = run_epochs()
    b = run_epochs()
    assert len(a) == len(b) and len(a) >= 4
    for (ia, ba), (ib, bb) in zip(a, b):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ba, bb)
    # different epochs draw different augs (not a frozen pipeline)
    assert not all(
        np.array_equal(a[i][0], a[i + len(a) // 2][0])
        for i in range(len(a) // 2)
    )
