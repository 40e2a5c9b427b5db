"""Batched multi-sequence tracking — TPU throughput mode.

No reference equivalent: the reference tracker (tracker.py:269-557) runs
sequences strictly one at a time, one forward per frame. Stepping N
sequences in lock-step through ONE batched jitted forward amortizes
dispatch latency and fixed per-frame costs — the natural serving
deployment for multi-camera / multi-clip workloads.

Measured on v5e (scripts/bench_batched_track.py, flagship config): the
win is RESOLUTION-DEPENDENT because the MSDA gather tables grow with
batch and fall off the fast gather tier (same mechanism as the training
batch-scaling finding, PLAN.md):
  544x960:  B=1 36.9 -> B=2 57.7 aggregate fps (+56%); B=4 regresses
  800x1440: B=2 already regresses (29.2 aggregate vs 40.3 single) —
            at flagship resolution keep batch_sequences=1 and scale
            multi-stream serving across chips instead.

Design: N untouched `Tracker` instances keep their per-sequence host
state machines; this class only moves WHERE the forward runs. Each step,
every live tracker stages its padded track-query state
(`Tracker._build_inputs`), the arrays are concatenated on the batch
axis, one forward runs, and each tracker consumes its own output row
(`Tracker._consume`). The encoded-memory / position caches
(`cache_prev_encoder`) live here as stacked [N, ...] arrays.

Constraints: all sequences in a batch must share the padded image shape
(group sequences by size bucket — engine/track.py does this); a finished
sequence's slot keeps riding with its last frame's inputs, outputs
discarded (no recompile for a shrinking batch).
"""
from __future__ import annotations

from collections import deque

import numpy as np

from .tracker import Tracker


def _stage_inputs(trackers, blobs, last_inputs):
    """Build per-slot forward inputs; dead slots (blob None) ride on
    their own last inputs, or — if the slot never started (empty/
    zero-frame sequence) — on any live slot's inputs so the batch shape
    never changes. Returns None when no slot has anything to ride on
    (every sequence empty)."""
    inputs: list = [None] * len(trackers)
    for i, (tr, blob) in enumerate(zip(trackers, blobs)):
        if blob is None:
            inputs[i] = last_inputs[i]
            continue
        inputs[i] = last_inputs[i] = tr._build_inputs(blob)
    donor = next((inp for inp in inputs if inp is not None), None)
    if donor is None:
        return None
    return [inp if inp is not None else donor for inp in inputs]


class BatchedTracker:
    def __init__(
        self,
        model,
        params,
        postprocess,
        tracker_cfg: dict,
        *,
        num_object_queries: int,
        num_track_slots: int,
        hidden_dim: int,
        n_sequences: int,
        overflow_boxes: bool = False,
        generate_attention_maps: bool = False,
    ):
        self.trackers = [
            Tracker(
                model, params, postprocess, tracker_cfg,
                num_object_queries=num_object_queries,
                num_track_slots=num_track_slots,
                hidden_dim=hidden_dim,
                overflow_boxes=overflow_boxes,
                generate_attention_maps=generate_attention_maps,
            )
            for _ in range(n_sequences)
        ]
        self.params = params
        # one shared jitted forward; jit specializes per batch size, so a
        # BatchedTracker(B) and plain Trackers (B=1) coexist in one cache
        self._fwd = self.trackers[0]._fwd
        self._prev_frame_dist = self.trackers[0].prev_frame_dist
        self.reset()

    @property
    def n_sequences(self) -> int:
        return len(self.trackers)

    def reset(self, hard: bool = True):
        for t in self.trackers:
            t.reset(hard)
        self._prev_features = deque([None], maxlen=self._prev_frame_dist)
        self._prev_memory = deque([None], maxlen=self._prev_frame_dist)
        self._pos_cache = None
        self._last_inputs: list[dict | None] = [None] * len(self.trackers)

    def step(self, blobs: list):
        """blobs[i]: the next frame blob of sequence i, or None once that
        sequence is finished (its slot repeats its last inputs; outputs
        are discarded)."""
        assert len(blobs) == len(self.trackers), (len(blobs), len(self.trackers))
        inputs = _stage_inputs(self.trackers, blobs, self._last_inputs)
        if inputs is None:
            return
        stacked = {
            k: np.concatenate([inp[k] for inp in inputs], axis=0)
            for k in inputs[0]
        }
        batch, targets, orig_size = Tracker.make_device_inputs(stacked)
        res = self._fwd(
            self.params, batch, targets, orig_size,
            self._prev_features[0], self._prev_memory[0], self._pos_cache,
        )
        for i, (tr, blob) in enumerate(zip(self.trackers, blobs)):
            if blob is None:
                continue
            out = {k: np.asarray(res[k][i]) for k in Tracker._ROW_KEYS}
            for k in Tracker._ROW_KEYS_OPT:
                if k in res:
                    out[k] = np.asarray(res[k][i])
            tr._consume(out, blob)
        if res["frame_features"] is not None:
            self._prev_features.append(res["frame_features"])
        if res.get("frame_memory") is not None:
            self._prev_memory.append(res["frame_memory"])
        if res.get("pos_cache") is not None:
            self._pos_cache = res["pos_cache"]

    def get_results(self, i: int):
        return self.trackers[i].get_results()


class BatchedTrackerKinematic:
    """Batched kinematic tracking: N detection sequences through one
    forward. The KineT forward is tiny and stateless across frames (no
    image, no cached encoder memory), so per-frame device time is almost
    entirely dispatch latency — batching approaches N x aggregate
    throughput. Same design as BatchedTracker: untouched per-sequence
    TrackerKinematic state machines, batching only moves the forward."""

    def __init__(
        self,
        model,
        params,
        postprocess,
        tracker_cfg: dict,
        *,
        num_object_queries: int,
        num_track_slots: int,
        trail_len: int,
        trail_enc_dim: int,
        meta_dim: int = 1,
        n_classes: int = 1,
        overflow_boxes: bool = False,
        n_sequences: int,
    ):
        from .kine_tracker import TrackerKinematic

        self.trackers = [
            TrackerKinematic(
                model, params, postprocess, tracker_cfg,
                num_object_queries=num_object_queries,
                num_track_slots=num_track_slots,
                trail_len=trail_len,
                trail_enc_dim=trail_enc_dim,
                meta_dim=meta_dim,
                n_classes=n_classes,
                overflow_boxes=overflow_boxes,
            )
            for _ in range(n_sequences)
        ]
        self.params = params
        self._fwd = self.trackers[0]._fwd_kine
        self._cls = TrackerKinematic
        self.reset()

    @property
    def n_sequences(self) -> int:
        return len(self.trackers)

    def reset(self, hard: bool = True):
        for t in self.trackers:
            t.reset(hard)
        self._last_inputs = [None] * len(self.trackers)

    def step(self, blobs: list):
        assert len(blobs) == len(self.trackers), (len(blobs), len(self.trackers))
        inputs = _stage_inputs(self.trackers, blobs, self._last_inputs)
        if inputs is None:
            return
        stacked = {
            k: np.concatenate([inp[k] for inp in inputs], axis=0)
            for k in inputs[0]
        }
        kb, targets, orig_size = self._cls.make_device_inputs(stacked)
        res = self._fwd(self.params, kb, targets, orig_size)
        for i, (tr, blob) in enumerate(zip(self.trackers, blobs)):
            if blob is None:
                continue
            tr._consume(
                {k: np.asarray(res[k][i]) for k in self._cls._ROW_KEYS}, blob
            )

    def get_results(self, i: int):
        return self.trackers[i].get_results()


def run_batched(batched, frame_iters: list) -> None:
    """Drive a BatchedTracker over N frame iterators of differing lengths.

    Steps while at least one sequence has frames left; finished slots ride
    along with their last inputs (outputs discarded)."""
    alive = [True] * len(frame_iters)
    while any(alive):
        blobs = []
        for i, it in enumerate(frame_iters):
            if not alive[i]:
                blobs.append(None)
                continue
            try:
                blobs.append(next(it))
            except StopIteration:
                alive[i] = False
                blobs.append(None)
        if not any(b is not None for b in blobs):
            break
        batched.step(blobs)
