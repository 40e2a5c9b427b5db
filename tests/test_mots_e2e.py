"""MOTS path: segmentation tracking model -> Tracker with masks ->
per-pixel overlap resolution -> MOTS RLE result file."""
import numpy as np
import jax
import jax.numpy as jnp

from kinet_tpu.config import load_config
from kinet_tpu.models.build import build_model
from kinet_tpu.models.postprocess import postprocess as pp_softmax
from kinet_tpu.tracking.tracker import Tracker
from kinet_tpu.structs import ImageBatch, Targets


def test_mots_tracking_and_rle_output(tmp_path):
    cfg = load_config("train.yaml", named=["train_mots20"]).replace(
        dataset="mot", backbone="resnet_test", hidden_dim=32, nheads=2,
        enc_layers=1, dec_layers=1, dim_feedforward=32, num_queries=6,
        max_track_queries=6, dropout=0.0, tracking=True, aux_loss=False,
    )
    model, _, _ = build_model(cfg)
    assert type(model).__name__ == "SegmWrapper"

    batch = ImageBatch(
        images=jnp.zeros((1, 64, 64, 3)), pad_mask=jnp.zeros((1, 64, 64), bool)
    )
    targets = Targets.create(
        jnp.full((1, 2, 4), 0.5), jnp.zeros((1, 2), jnp.int32),
        jnp.ones((1, 2), bool), num_track_queries=6, hidden_dim=32,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch, targets)

    tracker_cfg = dict(
        detection_obj_score_thresh=0.0,  # random weights: accept anything
        track_obj_score_thresh=0.0, detection_nms_thresh=0.9,
        track_nms_thresh=0.9, public_detections=False, inactive_patience=-1,
        reid_sim_threshold=0.0, reid_sim_only=False, reid_score_thresh=0.0,
        reid_greedy_matching=False, prev_frame_dist=1, steps_termination=1,
    )
    tr = Tracker(
        model, params, pp_softmax, tracker_cfg,
        num_object_queries=6, num_track_slots=6, hidden_dim=32,
    )
    blob = {
        "images": np.zeros((1, 64, 64, 3), np.float32),
        "pad_mask": np.zeros((1, 64, 64), bool),
        "orig_size": (64, 64),
        "dets": np.zeros((0, 4), np.float32),
    }
    tr.step(blob)
    results = tr.get_results()
    # with thresh 0 and softmax over 21 classes, some queries land on class 0
    got_masks = any(
        "mask" in fr for track in results.values() for fr in track.values()
    )
    if results:
        assert got_masks
        # masks are boolean after overlap resolution and disjoint
        frames = [
            fr["mask"] for track in results.values() for fr in track.values()
            if "mask" in fr
        ]
        stack = np.stack(frames)
        assert stack.dtype == bool
        assert (stack.sum(axis=0) <= 1).all()  # no overlapping pixels

        # write MOTS-format results
        from kinet_tpu.data.mots20_sequence import MOTS20Sequence

        class FakeSeq(MOTS20Sequence):
            def __init__(self):
                self._seq_name = "MOTS20-99"

        FakeSeq().write_results(results, str(tmp_path))
        lines = open(tmp_path / "MOTS20-99.txt").read().strip().splitlines()
        assert lines
        parts = lines[0].split(" ")
        assert len(parts) == 6 and parts[2] == "2"
