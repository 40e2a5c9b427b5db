import numpy as np
import jax.numpy as jnp

from kinet_tpu.ops.nms import nms_fixed, nms_numpy


def nms_oracle(boxes, scores, thr):
    """Literal greedy NMS (torchvision.ops.nms contract), O(n^2) loop."""

    def iou(a, b):
        x0, y0 = max(a[0], b[0]), max(a[1], b[1])
        x1, y1 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(x1 - x0, 0) * max(y1 - y0, 0)
        ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
        return inter / max(ua, 1e-9)

    order = sorted(range(len(boxes)), key=lambda i: -scores[i])
    keep, dead = [], set()
    for i in order:
        if i in dead:
            continue
        keep.append(i)
        for j in order:
            if j != i and j not in dead and iou(boxes[i], boxes[j]) > thr:
                dead.add(j)
    return np.asarray(keep, np.int64)


def _rand(seed, n=40):
    rng = np.random.default_rng(seed)
    cx = rng.uniform(50, 250, n)
    cy = rng.uniform(50, 250, n)
    w = rng.uniform(10, 80, n)
    h = rng.uniform(10, 80, n)
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    scores = rng.uniform(size=n)
    return boxes.astype(np.float32), scores.astype(np.float32)


def test_nms_numpy_matches_oracle():
    for seed in range(5):
        boxes, scores = _rand(seed)
        for thr in (0.3, 0.5, 0.9):
            ours = nms_numpy(boxes, scores, thr)
            ref = nms_oracle(boxes, scores, thr)
            np.testing.assert_array_equal(ours, ref)


def test_nms_fixed_matches_numpy():
    for seed in range(3):
        boxes, scores = _rand(seed, n=25)
        for thr in (0.3, 0.7):
            keep_mask = np.asarray(
                nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), thr)
            )
            ref = set(nms_numpy(boxes, scores, thr).tolist())
            assert set(np.nonzero(keep_mask)[0].tolist()) == ref
