"""Smoke tests for the analysis tools (reference:
src/track_param_search.py, src/compute_best_mean_epoch_from_splits.py,
src/parse_mot_results_to_tex.py, src/combine_frames.py)."""
import json

import numpy as np
from PIL import Image


def test_parse_mot_results_to_tex():
    from kinet_tpu.tools.parse_mot_results_to_tex import to_tex

    summary = {
        "MOT17-02": {
            "mota": 0.623, "idf1": 0.5758, "motp": 0.21,
            "recall": 0.66, "precision": 0.95,
            "num_false_positives": 16591, "num_misses": 192123,
            "num_switches": 4018,
        }
    }
    tex = to_tex(summary, caption="MOT17 test")
    assert "62.30" in tex and "57.58" in tex and "4018" in tex
    assert tex.count("\\\\") >= 2 and "\\caption{MOT17 test}" in tex
    assert "HOTA" not in tex  # legacy summaries have no hota column

    # with HOTA (reference MOT20 table carries it,
    # parse_mot_results_to_tex.py:72-79)
    summary["MOT17-02"]["hota"] = 0.5467
    tex = to_tex(summary)
    assert "HOTA" in tex and "54.67" in tex


def test_compute_best_epoch(tmp_path):
    from kinet_tpu.tools.compute_best_epoch import best_mean_epoch

    for i, motas in enumerate([[0.3, 0.5, 0.4], [0.2, 0.6, 0.5]]):
        d = tmp_path / f"split{i}"
        d.mkdir()
        with open(d / "metrics.jsonl", "w") as f:
            for e, m in enumerate(motas):
                f.write(json.dumps({"epoch": e, "mota": m}) + "\n")
    best, means = best_mean_epoch(
        [str(tmp_path / "split0"), str(tmp_path / "split1")]
    )
    assert best == 1  # mean mota [0.25, 0.55, 0.45]
    assert abs(means[1] - 0.55) < 1e-9


def test_combine_frames(tmp_path):
    from kinet_tpu.tools.combine_frames import combine

    a, b, out = tmp_path / "a", tmp_path / "b", tmp_path / "out"
    a.mkdir()
    b.mkdir()
    for i in range(2):
        Image.fromarray(
            np.full((8, 10, 3), 50 * (i + 1), np.uint8)
        ).save(a / f"{i:06d}.jpg")
        Image.fromarray(
            np.full((8, 10, 3), 10 * (i + 1), np.uint8)
        ).save(b / f"{i:06d}.jpg")
    combine(str(a), str(b), str(out))
    imgs = sorted(out.glob("*.jpg"))
    assert len(imgs) == 2
    arr = np.asarray(Image.open(imgs[0]))
    assert arr.shape == (8, 20, 3)  # side-by-side


def test_track_param_search_grid(monkeypatch, tmp_path):
    """search() sweeps the tracker_cfg grid via main_track and reports the
    best MOTA combo (reference track_param_search.py:55-122) — main_track
    stubbed to score one known combo highest."""
    import kinet_tpu.tools.track_param_search as tps
    from kinet_tpu.config import load_config

    def fake_main_track(run_cfg):
        good = (
            float(run_cfg.tracker_cfg.detection_obj_score_thresh) == 0.4
            and float(run_cfg.tracker_cfg.track_obj_score_thresh) == 0.5
        )
        mota = 0.9 if good else 0.1
        return {"MOT17-02": {"mota": mota, "idf1": mota}}

    monkeypatch.setattr(tps, "main_track", fake_main_track)
    cfg = load_config("track.yaml").replace(output_dir=str(tmp_path))
    results = tps.search(
        cfg,
        grid={
            "detection_obj_score_thresh": [0.3, 0.4],
            "track_obj_score_thresh": [0.4, 0.5],
        },
    )
    assert len(results) == 4
    best = max(results, key=lambda r: r["mota"])
    assert best["detection_obj_score_thresh"] == 0.4
    assert best["track_obj_score_thresh"] == 0.5
    assert best["mota"] == 0.9


def test_mot15_converter_branch(tmp_path):
    """MOT15 sequences have no seqinfo.ini and no class/visibility columns
    in gt.txt (reference generate_coco_from_mot.py:26-33,178): geometry
    comes from the hardcoded table and every conf==1 row is a person."""
    from kinet_tpu.tools.generate_coco_from_mot import generate_coco_from_mot

    seq = "TUD-Campus"  # 640x480, 71 frames in the MOT15 table
    seq_dir = tmp_path / "train" / seq
    (seq_dir / "gt").mkdir(parents=True)
    (seq_dir / "img1").mkdir()
    gt = [
        "1,1,10,20,30,60,1",   # kept (conf 1)
        "1,2,50,20,30,60,0",   # conf 0 -> ignore
        "2,1,12,20,30,60,1",
    ]
    (seq_dir / "gt" / "gt.txt").write_text("\n".join(gt) + "\n")

    coco = generate_coco_from_mot(str(tmp_path), seqs=[seq])
    assert len(coco["images"]) == 71
    assert coco["images"][0]["width"] == 640
    assert coco["images"][0]["height"] == 480
    anns = coco["annotations"]
    assert len(anns) == 3
    by_track = {(a["track_id"], a["image_id"]): a for a in anns}
    assert by_track[(1, 0)]["ignore"] == 0
    assert by_track[(2, 0)]["ignore"] == 1  # conf 0
