"""MOT training datasets (reference: src/trackformer/datasets/mot.py).

- MOT: CocoDetection over the MOT->COCO converted jsons; the previous frame
  is a REAL frame sampled within prev_frame_range of the current one using
  the extended json fields frame_id / first_frame_image_id / seq_length
  (reference mot.py:58-79),
- MOTKine: GT + external-detections json pairs for KineT, returning
  (detections, metadata, target) with tracklet trails
  (reference mot.py:318-461 MOT_Kine2),
- WeightedConcatDataset: samples sub-datasets by 1/seq_length weights
  (reference mot.py:501-513),
- MOT17Det detection result writer (reference mot.py:83-118).
"""
from __future__ import annotations

import csv
import os
import os.path as osp

import numpy as np

from .coco import CocoDetection


class MOT(CocoDetection):
    def __init__(self, *args, prev_frame_range: int = 1, **kw):
        super().__init__(*args, **kw)
        self._prev_frame_range = prev_frame_range

    @property
    def sequences(self):
        return self.coco.dataset.get("sequences")

    @property
    def frame_range(self):
        return self.coco.dataset.get("frame_range", {"start": 0, "end": 1.0})

    def seq_length(self, image_id):
        return self.coco.imgs[image_id]["seq_length"]

    def sample_weight(self, idx):
        return 1.0 / self.seq_length(self.ids[idx])

    def __getitem__(self, idx):
        image_id = self.ids[idx]
        seed = self._item_seed(idx)
        img, target = self._getitem_from_id(image_id, seed, jitter=False)
        sample = {"image": img, "target": target}

        if self._prev_frame:
            info = self.coco.imgs[image_id]
            frame_id = info["frame_id"]
            rng = np.random.default_rng(seed + 1)
            lo = max(0, frame_id - self._prev_frame_range)
            hi = min(
                frame_id + self._prev_frame_range, self.seq_length(image_id) - 1
            )
            prev_frame_id = int(rng.integers(lo, hi + 1))
            prev_image_id = info["first_frame_image_id"] + prev_frame_id
            prev_img, prev_target = self._getitem_from_id(
                prev_image_id, seed, jitter=False
            )
            sample["prev_image"] = prev_img
            sample["prev_target"] = prev_target

            if self._prev_prev_frame:
                # equidistant on the other side (reference mot.py:73-78)
                pp_frame_id = min(
                    max(0, prev_frame_id + prev_frame_id - frame_id),
                    self.seq_length(image_id) - 1,
                )
                pp_image_id = info["first_frame_image_id"] + pp_frame_id
                pp_img, pp_target = self._getitem_from_id(
                    pp_image_id, seed, jitter=False
                )
                sample["prev_prev_image"] = pp_img
                sample["prev_prev_target"] = pp_target
        return sample

    def write_result_files(self, results: dict, output_dir: str):
        """MOT17Det submission format (reference mot.py:83-118)."""
        files = {}
        for image_id, res in results.items():
            img = self.coco.imgs[image_id]
            stem = os.path.splitext(img["file_name"])[0]
            seq_name, frame = stem.split("_")
            frame = int(frame)
            outfile = osp.join(output_dir, f"{seq_name}.txt")
            files.setdefault(outfile, [])
            for box, score in zip(res["boxes"], res["scores"]):
                if score <= 0.7:
                    continue
                x1, y1, x2, y2 = [float(v) for v in box[:4]]
                files[outfile].append(
                    [frame, -1, x1, y1, x2 - x1, y2 - y1, float(score), -1, -1, -1]
                )
        os.makedirs(output_dir, exist_ok=True)
        for path, rows in files.items():
            with open(path, "w") as f:
                w = csv.writer(f, delimiter=",")
                for r in rows:
                    w.writerow(r)


class WeightedConcatDataset:
    """Concat datasets, sampling each by per-item weights
    (reference mot.py:501-513)."""

    def __init__(self, datasets):
        self.datasets = datasets
        self.cum = np.cumsum([len(d) for d in datasets])

    def __len__(self):
        return int(self.cum[-1])

    def __getitem__(self, idx):
        d = int(np.searchsorted(self.cum, idx, side="right"))
        base = 0 if d == 0 else int(self.cum[d - 1])
        return self.datasets[d][idx - base]

    def sample_weight(self, idx):
        d = int(np.searchsorted(self.cum, idx, side="right"))
        base = 0 if d == 0 else int(self.cum[d - 1])
        ds = self.datasets[d]
        if hasattr(ds, "sample_weight"):
            return ds.sample_weight(idx - base)
        return 1.0 / len(ds)
