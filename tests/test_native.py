"""Native C++ runtime kernels vs python references."""
import numpy as np
import pytest

from kinet_tpu import native
from kinet_tpu.ops.nms import nms_numpy


def test_native_builds():
    assert native.available(), "libkinet_io.so failed to build"


def test_parse_mot_csv(tmp_path):
    p = tmp_path / "det.txt"
    p.write_text("1,-1,10.5,20,30,40,0.9,-1,-1\n2,-1,15,25,30,40,0.8,-1,-1\n")
    rows = native.parse_mot_csv(str(p))
    assert rows.shape == (2, 7)
    np.testing.assert_allclose(rows[0], [1, -1, 10.5, 20, 30, 40, 0.9])
    np.testing.assert_allclose(rows[1][6], 0.8)


def test_normalize_pad_image_matches_python():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53, 3), np.uint8)
    out, mask = native.normalize_pad_image(img, 48, 64)
    assert out.shape == (48, 64, 3) and mask.shape == (48, 64)
    from kinet_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    ref = (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(out[:37, :53], ref, atol=1e-5)
    assert (out[37:] == 0).all() and (out[:, 53:] == 0).all()
    assert not mask[:37, :53].any() and mask[37:].all() and mask[:, 53:].all()


def test_native_nms_matches_python():
    rng = np.random.default_rng(1)
    for seed in range(5):
        n = 50
        cx, cy = rng.uniform(50, 250, (2, n))
        w, h = rng.uniform(10, 80, (2, n))
        boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1).astype(np.float32)
        scores = rng.uniform(size=n).astype(np.float32)
        for thr in (0.3, 0.5):
            a = native.greedy_nms(boxes, scores, thr)
            b = nms_numpy(boxes, scores, thr)
            np.testing.assert_array_equal(a, b)
