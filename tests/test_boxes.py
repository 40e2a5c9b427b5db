import jax.numpy as jnp
import numpy as np

from kinet_tpu.ops import boxes


def test_cxcywh_roundtrip():
    rng = np.random.default_rng(0)
    b = rng.uniform(0.1, 0.9, size=(7, 4)).astype(np.float32)
    out = boxes.box_xyxy_to_cxcywh(boxes.box_cxcywh_to_xyxy(jnp.asarray(b)))
    np.testing.assert_allclose(np.asarray(out), b, atol=1e-6)


def test_iou_matches_manual():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.array([[1.0, 1.0, 3.0, 3.0], [0.0, 0.0, 2.0, 2.0], [5.0, 5.0, 6.0, 6.0]])
    iou, union = boxes.box_iou(a, b)
    np.testing.assert_allclose(np.asarray(iou[0]), [1 / 7, 1.0, 0.0], atol=1e-6)


def test_giou_range_and_identity():
    rng = np.random.default_rng(1)
    xy = rng.uniform(0, 1, size=(5, 2)).astype(np.float32)
    wh = rng.uniform(0.05, 0.5, size=(5, 2)).astype(np.float32)
    b = boxes.box_cxcywh_to_xyxy(jnp.concatenate([jnp.asarray(xy), jnp.asarray(wh)], -1))
    g = np.asarray(boxes.generalized_box_iou(b, b))
    assert np.allclose(np.diag(g), 1.0, atol=1e-5)
    assert (g >= -1.0 - 1e-5).all() and (g <= 1.0 + 1e-5).all()


def test_giou_matches_torchvision_style_reference():
    # independent reference computation in numpy
    def ref_giou(a, b):
        area_a = (a[2] - a[0]) * (a[3] - a[1])
        area_b = (b[2] - b[0]) * (b[3] - b[1])
        ix0, iy0 = max(a[0], b[0]), max(a[1], b[1])
        ix1, iy1 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(ix1 - ix0, 0) * max(iy1 - iy0, 0)
        union = area_a + area_b - inter
        cx0, cy0 = min(a[0], b[0]), min(a[1], b[1])
        cx1, cy1 = max(a[2], b[2]), max(a[3], b[3])
        hull = (cx1 - cx0) * (cy1 - cy0)
        return inter / union - (hull - union) / hull

    rng = np.random.default_rng(2)
    for _ in range(20):
        p = np.sort(rng.uniform(0, 1, size=4)).astype(np.float32)
        q = np.sort(rng.uniform(0, 1, size=4)).astype(np.float32)
        a = np.array([p[0], p[1], p[2], p[3]])
        b = np.array([q[0], q[1], q[2], q[3]])
        got = np.asarray(
            boxes.generalized_box_iou(jnp.asarray(a)[None], jnp.asarray(b)[None])
        )[0, 0]
        np.testing.assert_allclose(got, ref_giou(a, b), atol=1e-5)


def test_masks_to_boxes():
    m = np.zeros((3, 10, 12), np.float32)
    m[0, 2:5, 3:7] = 1
    m[1, 0, 0] = 1
    out = np.asarray(boxes.masks_to_boxes(jnp.asarray(m)))
    np.testing.assert_allclose(out[0], [3, 2, 6, 4])
    np.testing.assert_allclose(out[1], [0, 0, 0, 0])
    np.testing.assert_allclose(out[2], [0, 0, 0, 0])
