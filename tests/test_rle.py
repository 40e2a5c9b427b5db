"""RLE codec tests: roundtrip + hand-computed wire format."""
import numpy as np

from kinet_tpu.utils.rle import (
    mask_to_rle,
    rle_decode_counts,
    rle_encode_counts,
    rle_to_mask,
)


def test_roundtrip_random():
    rng = np.random.default_rng(0)
    for _ in range(10):
        h, w = rng.integers(3, 40, 2)
        mask = rng.uniform(size=(h, w)) > 0.6
        rle = mask_to_rle(mask)
        back = rle_to_mask(rle["counts"], rle["size"])
        np.testing.assert_array_equal(back, mask)


def test_counts_delta_coding_roundtrip():
    for counts in ([0, 5, 3, 5, 3], [10], [0, 1000000, 3], [2, 2, 2, 2, 2, 2]):
        s = rle_encode_counts(list(counts))
        assert rle_decode_counts(s) == list(counts)


def test_column_major_layout():
    # mask with a single pixel at (row 1, col 0) in a 3x2 mask:
    # column-major flat = [c0r0, c0r1, c0r2, c1r0, c1r1, c1r2]
    mask = np.zeros((3, 2), bool)
    mask[1, 0] = True
    rle = mask_to_rle(mask)
    assert rle_decode_counts(rle["counts"]) == [1, 1, 4]
    np.testing.assert_array_equal(rle_to_mask(rle["counts"], (3, 2)), mask)


def test_empty_and_full():
    empty = np.zeros((5, 4), bool)
    full = np.ones((5, 4), bool)
    for m in (empty, full):
        rle = mask_to_rle(m)
        np.testing.assert_array_equal(rle_to_mask(rle["counts"], (5, 4)), m)
