"""End-to-end tracking session: synthetic MOT17 sequence on disk ->
train-config round trip -> Tracker over frames -> MOTChallenge result file
-> CLEAR-MOT metrics. Exercises the full track.py pipeline
(reference src/track.py:32-223)."""
import configparser
import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from kinet_tpu.config import load_config, save_config


def _write_sequence(root, name, n_frames=4, h=96, w=128, seed=0):
    seq_dir = root / "MOT17" / "train" / name
    img_dir = seq_dir / "img1"
    gt_dir = seq_dir / "gt"
    det_dir = seq_dir / "det"
    for d in (img_dir, gt_dir, det_dir):
        d.mkdir(parents=True)

    rng = np.random.default_rng(seed)
    for f in range(1, n_frames + 1):
        arr = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{f:06d}.jpg")

    cfgp = configparser.ConfigParser()
    cfgp["Sequence"] = {
        "name": name, "imDir": "img1", "frameRate": "30",
        "seqLength": str(n_frames), "imWidth": str(w), "imHeight": str(h),
        "imExt": ".jpg",
    }
    with open(seq_dir / "seqinfo.ini", "w") as fh:
        cfgp.write(fh)

    # one GT track moving right
    with open(gt_dir / "gt.txt", "w") as fh:
        for f in range(1, n_frames + 1):
            x = 10 + 5 * f
            fh.write(f"{f},1,{x},20,30,40,1,1,1.0\n")
    with open(det_dir / "det.txt", "w") as fh:
        for f in range(1, n_frames + 1):
            x = 10 + 5 * f
            fh.write(f"{f},-1,{x},20,30,40,0.9,-1,-1\n")


@pytest.fixture(scope="module")
def synthetic_mot17(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    (root / "MOT17" / "test").mkdir(parents=True)
    _write_sequence(root, "MOT17-02-FRCNN", seed=0)
    # a second same-shape sequence for the batched session test
    _write_sequence(root, "MOT17-04-FRCNN", seed=1)
    return str(root)


def test_sequence_parsing(synthetic_mot17):
    from kinet_tpu.data.sequences import MOT17Sequence

    cfg = load_config("train.yaml")
    seq = MOT17Sequence(
        root_dir=synthetic_mot17, seq_name="MOT17-02", dets="FRCNN",
        img_transform=cfg.img_transform,
    )
    assert len(seq) == 4
    assert not seq.no_gt
    blob = seq[0]
    assert blob["images"].shape[0] == 1
    assert blob["orig_size"] == (96, 128)
    assert blob["dets"].shape == (1, 4)
    assert 1 in blob["gt"]


def test_full_track_session_batched(synthetic_mot17, tmp_path):
    """batch_sequences=2: both sequences ride ONE batched forward
    (tracking/batched.py); MOTChallenge files + summary for each."""
    import jax
    import jax.numpy as jnp

    from kinet_tpu.engine.track import main_track
    from kinet_tpu.models.build import build_model
    from kinet_tpu.structs import ImageBatch, Targets
    from kinet_tpu.utils.checkpoint import CheckpointManager

    train_cfg = load_config("train.yaml", named=["train_tracking"]).replace(
        dataset="mot", backbone="resnet_test", hidden_dim=32, nheads=2,
        enc_layers=1, dec_layers=1, dim_feedforward=32, num_queries=8,
        max_track_queries=8, dropout=0.0,
        **{"img_transform.max_size": 160, "img_transform.val_width": 96},
    )
    model, _, _ = build_model(train_cfg)
    batch = ImageBatch(
        images=jnp.zeros((1, 96, 128, 3)),
        pad_mask=jnp.zeros((1, 96, 128), bool),
    )
    targets = Targets.create(
        jnp.full((1, 2, 4), 0.5), jnp.zeros((1, 2), jnp.int32),
        jnp.ones((1, 2), bool), num_track_queries=8, hidden_dim=32,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch, targets)

    ckpt_dir = tmp_path / "model"
    save_config(train_cfg, ckpt_dir)
    mgr = CheckpointManager(str(ckpt_dir))
    mgr._save(mgr.dir / "checkpoint", {"params": params, "epoch": 0})

    track_cfg = load_config("track.yaml").replace(
        obj_detect_checkpoint_dir=str(ckpt_dir),
        data_root_dir=synthetic_mot17,
        dataset_name="MOT17-02-FRCNN,MOT17-04-FRCNN",
        output_dir=str(tmp_path / "results"),
        batch_sequences=2,
    )
    summary = main_track(track_cfg)
    assert summary is not None
    assert "MOT17-02-FRCNN" in summary and "MOT17-04-FRCNN" in summary
    out = tmp_path / "results" / "MOT17-02-FRCNN,MOT17-04-FRCNN"
    for name in ("MOT17-02-FRCNN", "MOT17-04-FRCNN"):
        res_file = out / f"{name}.txt"
        assert res_file.exists()
        for line in open(res_file):
            assert len(line.strip().split(",")) == 10


def test_full_track_session(synthetic_mot17, tmp_path):
    """Build a tiny tracking model, save ckpt+config, run main_track."""
    import jax
    import jax.numpy as jnp

    from kinet_tpu.models.build import build_model
    from kinet_tpu.structs import ImageBatch, Targets
    from kinet_tpu.utils.checkpoint import CheckpointManager
    from kinet_tpu.engine.track import main_track

    train_cfg = load_config("train.yaml", named=["train_tracking"]).replace(
        dataset="mot", backbone="resnet_test", hidden_dim=32, nheads=2,
        enc_layers=1, dec_layers=1, dim_feedforward=32, num_queries=8,
        max_track_queries=8, dropout=0.0,
        **{"img_transform.max_size": 160, "img_transform.val_width": 96},
    )
    model, _, _ = build_model(train_cfg)
    batch = ImageBatch(
        images=jnp.zeros((1, 96, 128, 3)), pad_mask=jnp.zeros((1, 96, 128), bool)
    )
    targets = Targets.create(
        jnp.full((1, 2, 4), 0.5), jnp.zeros((1, 2), jnp.int32),
        jnp.ones((1, 2), bool), num_track_queries=8, hidden_dim=32,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch, targets)

    ckpt_dir = tmp_path / "model"
    save_config(train_cfg, ckpt_dir)
    mgr = CheckpointManager(str(ckpt_dir))
    import kinet_tpu.engine.state as st

    mgr._save(mgr.dir / "checkpoint", {"params": params, "epoch": 0})

    track_cfg = load_config("track.yaml").replace(
        obj_detect_checkpoint_dir=str(ckpt_dir),
        data_root_dir=synthetic_mot17,
        dataset_name="MOT17-02-FRCNN",
        output_dir=str(tmp_path / "results"),
    )
    summary = main_track(track_cfg)
    # summary exists (GT present); result file written in MOTChallenge format
    assert summary is not None and "MOT17-02-FRCNN" in summary
    res_file = tmp_path / "results" / "MOT17-02-FRCNN" / "MOT17-02-FRCNN.txt"
    assert res_file.exists()
    for line in open(res_file):
        parts = line.strip().split(",")
        assert len(parts) == 10
        assert int(parts[0]) >= 1 and int(parts[1]) >= 1


def test_full_kinet_track_session(synthetic_mot17, tmp_path):
    """KineT path: encoder-only model over external detections."""
    import jax
    import jax.numpy as jnp

    from kinet_tpu.models.build import build_model
    from kinet_tpu.structs import KineBatch, Targets
    from kinet_tpu.utils.checkpoint import CheckpointManager
    from kinet_tpu.engine.track import main_track

    l, enc = 3, 4
    train_cfg = load_config("train.yaml", named=["train_kinet2"]).replace(
        dataset="mot_kine", hidden_dim=32, nheads=2, dim_feedforward=32,
        dropout=0.0, max_number_detection=8, max_track_queries=8,
        track_prev_frame_range=l, encoding_dim_tracklets=enc, use_encoding_tracklets=True, tracking=True,
    )
    model, _, _ = build_model(train_cfg)
    e_dim = l * 4 * enc + l * 1
    kb = KineBatch(
        detections=jnp.zeros((1, 8, 4)), metadata=jnp.zeros((1, 8, 1)),
        pad_mask=jnp.zeros((1, 8), bool),
    )
    targets = Targets.create(
        jnp.zeros((1, 1, 4)), jnp.zeros((1, 1), jnp.int32),
        jnp.zeros((1, 1), bool), num_track_queries=8, hidden_dim=e_dim,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), kb, targets)

    ckpt_dir = tmp_path / "kinet_model"
    save_config(train_cfg, ckpt_dir)
    mgr = CheckpointManager(str(ckpt_dir))
    mgr._save(mgr.dir / "checkpoint", {"params": params, "epoch": 0})

    # both sequences through the BATCHED kinematic path (batch_sequences=2
    # -> BatchedTrackerKinematic) — covers the kine session and the
    # batched-kine engine wiring in one run
    track_cfg = load_config("track_kinet.yaml").replace(
        obj_detect_checkpoint_dir=str(ckpt_dir),
        data_root_dir=synthetic_mot17,
        dataset_name="MOT17-02-FRCNN,MOT17-04-FRCNN",
        output_dir=str(tmp_path / "kinet_results"),
        batch_sequences=2,
    )
    summary = main_track(track_cfg)
    assert summary is not None
    assert "MOT17-02-FRCNN" in summary and "MOT17-04-FRCNN" in summary
    out = tmp_path / "kinet_results" / "MOT17-02-FRCNN,MOT17-04-FRCNN"
    for name in ("MOT17-02-FRCNN", "MOT17-04-FRCNN"):
        assert (out / f"{name}.txt").exists()


def test_full_kinet_dual_stream_track_session(synthetic_mot17, tmp_path):
    """Dual-stream KineT (train_kinet.yaml -> KinematicDetectorTransformer,
    reference detr.py:288-425) through the full track pipeline: ckpt+config
    round-trip -> TrackerKinematic -> MOTChallenge result file + CLEAR-MOT."""
    import jax
    import jax.numpy as jnp

    from kinet_tpu.models.build import build_model
    from kinet_tpu.structs import KineBatch, Targets
    from kinet_tpu.utils.checkpoint import CheckpointManager
    from kinet_tpu.engine.track import main_track

    l, enc = 3, 4
    train_cfg = load_config("train.yaml", named=["train_kinet"]).replace(
        dataset="mot_kine", hidden_dim=32, nheads=2, dim_feedforward=32,
        num_queries=8, dropout=0.0, max_number_detection=8,
        max_track_queries=8, track_prev_frame_range=l,
        encoding_dim_tracklets=enc, use_encoding_tracklets=True, tracking=True,
    )
    model, _, _ = build_model(train_cfg)
    assert type(model).__name__ == "KinematicDetectorTransformer"
    e_dim = l * 4 * enc + l * 1
    kb = KineBatch(
        detections=jnp.zeros((1, 8, 4)), metadata=jnp.zeros((1, 8, 1)),
        pad_mask=jnp.zeros((1, 8), bool),
    )
    targets = Targets.create(
        jnp.zeros((1, 1, 4)), jnp.zeros((1, 1), jnp.int32),
        jnp.zeros((1, 1), bool), num_track_queries=8, hidden_dim=e_dim,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), kb, targets)

    ckpt_dir = tmp_path / "kinet_dual_model"
    save_config(train_cfg, ckpt_dir)
    mgr = CheckpointManager(str(ckpt_dir))
    mgr._save(mgr.dir / "checkpoint", {"params": params, "epoch": 0})

    track_cfg = load_config("track_kinet.yaml").replace(
        obj_detect_checkpoint_dir=str(ckpt_dir),
        data_root_dir=synthetic_mot17,
        dataset_name="MOT17-02-FRCNN",
        output_dir=str(tmp_path / "kinet_dual_results"),
    )
    summary = main_track(track_cfg)
    assert summary is not None
    res_file = (
        tmp_path / "kinet_dual_results" / "MOT17-02-FRCNN" / "MOT17-02-FRCNN.txt"
    )
    assert res_file.exists()


def test_prefetcher_close_unblocks_worker():
    """A consumer that aborts its frame loop early must not leak the
    prefetch worker blocked on q.put (advisor round-2 low finding):
    close() raises the stop flag, drains, and joins the thread."""
    from kinet_tpu.engine.track import _Prefetcher

    class Seq:
        def __len__(self):
            return 100

        def __getitem__(self, i):
            return {"i": i}

    pf = _Prefetcher(Seq(), 0, 100, depth=2)
    it = iter(pf)
    assert next(it)["i"] == 0  # worker is alive and producing
    pf.close()  # consumer aborts after one frame
    assert not pf._t.is_alive()

    # context-manager form: exception inside the loop still joins the worker
    try:
        with _Prefetcher(Seq(), 0, 100, depth=2) as frames:
            for blob in frames:
                raise RuntimeError("tracker died")
    except RuntimeError:
        pass
    assert not frames._t.is_alive()


def test_prefetcher_slow_consumer_gets_sentinel():
    """End-of-sequence sentinel must be delivered even when the consumer
    lags the producer by >= depth at worker exit (queue full). The first
    fix dropped the sentinel via put_nowait in that race, deadlocking the
    consumer at q.get() — seen in a real suite run under CPU contention."""
    import threading
    import time

    from kinet_tpu.engine.track import _Prefetcher

    class Seq:
        def __getitem__(self, i):
            return {"i": i}

    pf = _Prefetcher(Seq(), 0, 3, depth=1)
    time.sleep(0.5)  # let the producer fill the queue and reach its exit
    got = []

    def consume():
        for blob in pf:
            got.append(blob["i"])
            time.sleep(0.05)  # stay slower than the producer

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    t.join(timeout=10.0)
    hung = t.is_alive()
    pf.close()
    assert not hung, "consumer never received the end-of-sequence sentinel"
    assert got == [0, 1, 2]
