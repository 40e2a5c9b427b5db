"""Tracker attention-map capture + visualization utilities.

Covers the last untested inference surfaces: the sowed decoder
cross-attention maps the Tracker attaches to results (≙ reference
tracker.py:39-62 forward hooks + track_utils plot of attention maps) and
the file-backed visualizers (≙ reference vis.py / track_utils.py:127-237).
"""
import dataclasses
import os

import jax
import numpy as np
import pytest

from kinet_tpu.config import load_config
from kinet_tpu.models.build import build_model
from kinet_tpu.structs import ImageBatch, Targets


def tiny_tracking_cfg():
    cfg = load_config("train.yaml")
    return cfg.replace(
        dataset="mot",
        backbone="resnet_test",
        hidden_dim=32,
        nheads=2,
        enc_layers=1,
        dec_layers=2,
        dim_feedforward=64,
        num_queries=12,
        max_objects=5,
        tracking=True,
        max_track_queries=4,
        dropout=0.0,
    )


TRACKER_CFG = dict(
    detection_obj_score_thresh=0.01,  # random-init scores hover near 1/21
    track_obj_score_thresh=0.01,
    detection_nms_thresh=0.9,
    track_nms_thresh=0.9,
    public_detections=False,
    inactive_patience=-1,
    reid_sim_threshold=0.0,
    reid_sim_only=False,
    reid_score_thresh=0.99,
    reid_greedy_matching=False,
    prev_frame_dist=1,
    steps_termination=1,
)


def test_tracker_attention_map_capture():
    """generate_attention_maps=True: every written result frame carries an
    attention_map over the encoder memory grid (reference tracker.py:39-62
    captures the last decoder layer's cross-attn via forward hooks; here the
    transformer sows it and make_forward_fn extracts it)."""
    from kinet_tpu.models.postprocess import postprocess
    from kinet_tpu.tracking.tracker import Tracker

    cfg = tiny_tracking_cfg()
    model, _, _ = build_model(cfg)
    model = dataclasses.replace(model, generate_attention_maps=True)

    b, h, w = 1, 64, 96
    images = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, 3), "float32")
    batch = ImageBatch(images=images, pad_mask=np.zeros((b, h, w), bool))
    targets = Targets.create(
        np.full((b, 1, 4), 0.5, np.float32),
        np.zeros((b, 1), np.int32),
        np.zeros((b, 1), bool),
        num_track_queries=4,
        hidden_dim=32,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch, targets)
    # the tracker keeps only person-class (label 0) rows: bias the class
    # head so every query predicts class 0 with a confident score
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy ok
    bias = np.full(params["params"]["class_embed"]["bias"].shape, -4.0, np.float32)
    bias[0] = 4.0
    params["params"]["class_embed"]["bias"] = bias

    tracker = Tracker(
        model, params, postprocess, TRACKER_CFG,
        num_object_queries=12, num_track_slots=4, hidden_dim=32,
        generate_attention_maps=True,
    )
    blob = {
        "images": np.asarray(images),
        "pad_mask": np.zeros((b, h, w), bool),
        "orig_size": (h, w),
        "dets": np.zeros((0, 4), np.float32),
    }
    tracker.step(blob)
    tracker.step(blob)
    results = tracker.get_results()
    assert results, "random-init detections above 0.01 should spawn tracks"
    maps = [
        fr["attention_map"]
        for track in results.values()
        for fr in track.values()
        if "attention_map" in fr
    ]
    assert maps, "no attention maps attached to any result frame"
    # encoder memory grid at stride 32: 64x96 -> 2x3
    for m in maps:
        assert np.asarray(m).shape == (2, 3)
        assert np.all(np.isfinite(np.asarray(m, np.float32)))


class _FakeSeq:
    """Minimal sequence protocol for plot_sequence: len() + data[i]['im_path']."""

    def __init__(self, paths):
        self.data = [{"im_path": p} for p in paths]

    def __len__(self):
        return len(self.data)


def test_plot_sequence_writes_frames(tmp_path):
    from PIL import Image

    from kinet_tpu.utils.vis import plot_sequence

    paths = []
    for i in range(3):
        p = tmp_path / f"f{i}.jpg"
        Image.fromarray(np.zeros((40, 60, 3), np.uint8)).save(p)
        paths.append(str(p))
    results = {
        0: {0: {"bbox": [5, 5, 20, 30]}, 1: {"bbox": [10, 5, 25, 30]}},
        1: {2: {"bbox": [30, 10, 50, 35]}},
    }
    out = str(tmp_path / "plots")
    plot_sequence(results, _FakeSeq(paths), out)
    files = sorted(os.listdir(out))
    assert files == ["000000.jpg", "000001.jpg", "000002.jpg"]
    # frame 0 has a red (palette[0]) box drawn; the source was all-black
    from PIL import Image as I

    arr = np.asarray(I.open(os.path.join(out, "000000.jpg")).convert("RGB"))
    assert arr.max() > 100  # box pixels present


def test_line_and_img_vis_save(tmp_path):
    from kinet_tpu.utils.vis import ImgVis, LineVis, build_visualizers

    out = str(tmp_path)
    lv = LineVis({"title": "train loss", "legend": ["loss"]}, out)
    for i in range(4):
        lv.plot([1.0 / (i + 1)], i)
    lv.save()
    assert os.path.exists(os.path.join(out, "vis", "train_loss.png"))

    iv = ImgVis({"title": "examples"}, out)
    iv.plot([np.zeros((16, 16, 3), np.uint8)])
    assert os.path.exists(os.path.join(out, "vis", "examples_0000.jpg"))

    vis = build_visualizers(
        type("C", (), {"get": lambda self, k, d=None: {"output_dir": out}.get(k, d)})()
    )
    assert {"train", "val"} <= set(vis)
    assert "iter_metrics" in vis["train"]


def test_vis_results_draws_track_queries(tmp_path):
    from kinet_tpu.utils.vis import ImgVis, vis_results

    iv = ImgVis({"title": "res"}, str(tmp_path))
    img = np.zeros((32, 32, 3), np.uint8)
    result = {
        "boxes": np.array([[2.0, 2.0, 10.0, 10.0]]),
        "track_query_boxes": np.array([[12.0, 12.0, 20.0, 20.0]]),
        "track_query_fp_boxes": np.array([[22.0, 22.0, 30.0, 30.0]]),
    }
    vis_results(iv, img, result, None, tracking=True)
    assert iv.count == 1
    assert os.path.exists(os.path.join(str(tmp_path), "vis", "res_0000.jpg"))


def test_metrics_sink_jsonl_streams_live(tmp_path):
    """--metrics_sink jsonl: every plot() point lands in metrics.jsonl
    immediately (the tail -f live view ≙ reference's live Visdom
    windows, vis.py:247-374)."""
    import json

    from kinet_tpu.utils.vis import build_visualizers

    out = str(tmp_path)
    cfg = {"output_dir": out, "metrics_sink": "jsonl"}
    vis = build_visualizers(
        type("C", (), {"get": lambda self, k, d=None: cfg.get(k, d)})()
    )
    vis["train"]["iter_metrics"].plot([0.5, 0.1, 0.2, 0.3], 7)
    vis["val"]["epoch_metrics"].plot([0.9, 0.95, 0.8, 0.85], 1)

    path = os.path.join(out, "vis", "metrics.jsonl")
    rows = [json.loads(l) for l in open(path)]
    assert len(rows) == 8  # streamed before any save()/close()
    assert rows[0] == {
        "series": "train iter metrics", "name": "loss", "x": 7.0,
        "value": 0.5,
    }
    assert {r["series"] for r in rows} == {
        "train iter metrics", "val epoch metrics",
    }
    vis["sink"].close()
