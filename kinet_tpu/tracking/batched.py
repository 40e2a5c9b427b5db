"""Batched multi-sequence tracking — TPU throughput mode.

No reference equivalent: the reference tracker (tracker.py:269-557) runs
sequences strictly one at a time, one forward per frame. Stepping N
sequences in lock-step through ONE batched jitted forward amortizes
dispatch latency and fixed per-frame costs — the natural serving
deployment for multi-camera / multi-clip workloads.

Two device execution forms, selected by `batch_exec` (default "auto"):
  stacked     — one [B, ...] forward. Wins when frames are small enough
                that per-frame time is dispatch-dominated: 544x960 B=2 =
                +56% aggregate fps (36.9 -> 57.7).
  interleaved — B inlined B=1 subgraphs inside one jit. At large frames
                the stacked MSDA tables tile as T(2,128) and pay relayout
                copies (~7 ms/frame at 800x1440 B=2, profile_top_ops r4);
                interleaving keeps each subgraph's optimal single-stream
                lowering while still amortizing host dispatch. 800x1440
                B=2: stacked 34.6 vs interleaved 40.4 vs 39.9 single.
At flagship resolution the device is the bottleneck (cached-frame device
time 22.15 ms vs 25.06 ms wall) so batching can only recover the ~3 ms
host gap — large aggregate wins exist only in the small-frame regime.

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

import jax
import jax.numpy as jnp
import numpy as np

from .tracker import Tracker


# Per-frame pixel count above which the stacked-batch graph loses to
# interleaved execution (measured crossover between 544x960, where
# stacked is +56%, and 800x1440, where stacked regresses ~14% and
# interleaved holds parity+1%; scripts/bench_batched_track.py /
# bench_interleaved_track.py, v5e).
_STACKED_MAX_PIXELS = 544 * 960


def _make_interleaved_fwd(fwd, n: int):
    """One jit stepping n sequences as n SINGLE-STREAM subgraph calls.

    At large resolutions the stacked [B, ...] graph pays real layout
    costs: the B-scaled MSDA tables tile as T(2,128) and need relayout
    copies + slice passes worth ~7 ms/frame at 800x1440 B=2
    (profile_top_ops r4). Inlining the B=1 forward n times keeps each
    subgraph's optimal single-stream lowering; the batch still amortizes
    host dispatch (one transfer + one dispatch per n frames). Measured:
    B=2 800x1440 aggregate 34.6 (stacked) vs 40.4 (interleaved) vs 39.9
    single-stream fps."""

    def row(tree, e):
        return jax.tree_util.tree_map(lambda x: x[e : e + 1], tree)

    @jax.jit
    def run(params, batch, targets, orig_size, prev_features, prev_memory,
            pos_cache):
        rows = [
            fwd(
                params, row(batch, e), row(targets, e), row(orig_size, e),
                row(prev_features, e), row(prev_memory, e),
                row(pos_cache, e),
            )
            for e in range(n)
        ]
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *rows
        )

    return run


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
        # batch_exec: "stacked" = one [B, ...] forward (wins when frames
        # are small / dispatch-bound), "interleaved" = B inlined B=1
        # subgraphs in one jit (wins at large frames where the stacked
        # MSDA tables pay layout copies), "auto" = by frame pixel count.
        self._batch_exec = str(tracker_cfg.get("batch_exec", "auto"))
        if self._batch_exec not in ("auto", "stacked", "interleaved"):
            raise ValueError(f"unknown batch_exec {self._batch_exec!r}")
        self._fwd_interleaved = None  # built lazily on first use
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

    def _select_fwd(self, batch):
        if len(self.trackers) == 1:
            return self._fwd
        mode = self._batch_exec
        if mode == "auto":
            pixels = int(batch.images.shape[1]) * int(batch.images.shape[2])
            mode = "stacked" if pixels <= _STACKED_MAX_PIXELS else "interleaved"
        if mode == "stacked":
            return self._fwd
        if self._fwd_interleaved is None:
            self._fwd_interleaved = _make_interleaved_fwd(
                self._fwd, len(self.trackers)
            )
        return self._fwd_interleaved

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
        fwd = self._select_fwd(batch)
        res = fwd(
            self.params, batch, targets, orig_size,
            self._prev_features[0], self._prev_memory[0], self._pos_cache,
        )
        # one batched transfer for all sequences' rows (one RTT, not
        # keys x sequences; see scripts/probe_host_gap.py)
        fetch = {k: res[k] for k in Tracker._ROW_KEYS}
        for k in Tracker._ROW_KEYS_OPT:
            if k in res:
                fetch[k] = res[k]
        fetched = jax.device_get(fetch)
        for i, (tr, blob) in enumerate(zip(self.trackers, blobs)):
            if blob is None:
                continue
            out = {k: np.asarray(v[i]) for k, v in fetched.items()}
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
        fetched = jax.device_get({k: res[k] for k in self._cls._ROW_KEYS})
        for i, (tr, blob) in enumerate(zip(self.trackers, blobs)):
            if blob is None:
                continue
            tr._consume(
                {k: np.asarray(v[i]) for k, v in fetched.items()}, blob
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
