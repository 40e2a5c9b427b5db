"""all_gather_objects: payload-proportional traffic + round-trip.

Reference all_gather (util/misc.py:91-132) gathers byte LENGTHS first,
then payloads padded to max(len). The round-3 rebuild padded every
payload to a fixed 16 MB; this pins the two-phase fix (VERDICT r3 #7).
"""
import pickle

import numpy as np
import pytest

from kinet_tpu.utils import dist


class _FakeWorld:
    """Simulate an N-host process_allgather from rank 0's view: every
    host contributes the same logical object here, but with distinct
    pickled sizes via a per-rank transform."""

    def __init__(self, objs):
        self.objs = objs
        self.shipped_buf_bytes = []

    def process_allgather(self, arr):
        arr = np.asarray(arr)
        if arr.dtype == np.uint8:
            # payload phase: rank 0's buffer is `arr`; other ranks'
            # payloads are pickled into same-size buffers.
            self.shipped_buf_bytes.append(arr.size)
            rows = []
            for o in self.objs:
                p = np.frombuffer(pickle.dumps(o), np.uint8)
                assert p.size <= arr.size
                row = np.zeros(arr.size, np.uint8)
                row[: p.size] = p
                rows.append(row)
            rows[0] = arr
            return np.stack(rows)
        # length phase
        return np.asarray(
            [len(pickle.dumps(o)) for o in self.objs], np.int64
        )


@pytest.mark.parametrize(
    "objs",
    [
        [{"a": 1}, {"b": list(range(500))}],
        [None, "x" * 10_000, (1, 2.5, b"\x00" * 3)],
    ],
)
def test_all_gather_objects_roundtrip_and_proportional(monkeypatch, objs):
    world = _FakeWorld(objs)
    monkeypatch.setattr(dist, "get_world_size", lambda: len(objs))
    import jax.experimental.multihost_utils as mhu

    monkeypatch.setattr(mhu, "process_allgather", world.process_allgather)

    out = dist.all_gather_objects(objs[0])
    assert out == objs

    max_len = max(len(pickle.dumps(o)) for o in objs)
    assert world.shipped_buf_bytes == [max_len]
    # the old implementation shipped a fixed 16 MB + 8 header bytes
    assert max_len < (1 << 24)


def test_all_gather_objects_world1_short_circuit():
    obj = {"only": "me"}
    assert dist.all_gather_objects(obj) == [obj]


def test_gather_buf_bytes_min_one():
    assert dist._gather_buf_bytes(np.asarray([0, 0])) == 1
    assert dist._gather_buf_bytes(np.asarray([3, 7, 5])) == 7
