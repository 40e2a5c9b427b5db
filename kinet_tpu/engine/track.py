"""Tracking entry point (reference: src/track.py).

Usage (≙ `python src/track.py with dataset_name=MOT17-02-FRCNN ...`):

    python -m kinet_tpu.engine.track --config track.yaml \
        obj_detect_checkpoint_dir=models/exp1 dataset_name=MOT17-02-FRCNN

Pipeline (reference call stack, SURVEY §3.2):
- reload the train-time config.yaml of the checkpoint to rebuild the model
  exactly (track.py:66-70),
- Tracker / TrackerKinematic over every sequence of TrackDatasetFactory,
- write MOTChallenge result files, optional linear gap interpolation
  (reference util/track_utils.py:240-272 — implemented with the evident
  intent, the reference's version returns an undefined variable, SURVEY §8.3),
- CLEAR-MOT + IDF1 summary over all sequences with GT.
"""
from __future__ import annotations

import argparse
import os.path as osp
import time

import numpy as np

from ..config import Config, load_config, load_saved_config, parse_cli_overrides
from ..data.sequences import TrackDatasetFactory
from ..models.build import build_model
from ..tracking.tracker import Tracker
from ..utils.mot_metrics import evaluate_mot_accums, format_summary, get_mot_accum


def _dataset_dirname(dataset_name) -> str:
    """Output subdir for result files: dataset_name may be a YAML list
    or a comma-separated string; normalize to one path-safe token."""
    if isinstance(dataset_name, (list, tuple)):
        return ",".join(str(n).strip() for n in dataset_name)
    return str(dataset_name).strip()


def interpolate_tracks(tracks: dict) -> dict:
    """Linear gap interpolation (intent of reference track_utils.py:240-272)."""
    out = {}
    for tid, frames in tracks.items():
        out[tid] = dict(frames)
        keys = sorted(frames.keys())
        for a, b in zip(keys[:-1], keys[1:]):
            if b - a <= 1:
                continue
            ba = np.asarray(frames[a]["bbox"], np.float64)
            bb = np.asarray(frames[b]["bbox"], np.float64)
            for f in range(a + 1, b):
                t = (f - a) / (b - a)
                out[tid][f] = {
                    "bbox": (ba * (1 - t) + bb * t).astype(np.float32),
                    "score": frames[a]["score"],
                    "obj_ind": frames[a].get("obj_ind", -1),
                }
    return out


class _Prefetcher:
    """Single-worker look-ahead frame loader: decodes + preprocesses frame
    i+1 on a thread while the tracker steps frame i, overlapping host IO
    with device compute (the reference gets the same overlap from its
    torch DataLoader workers, track.py:136-137). Worker exceptions are
    re-raised in the consumer."""

    def __init__(self, seq, start: int, end: int, depth: int = 2):
        import queue
        import threading

        self._q = queue.Queue(maxsize=depth)
        self._exc = None
        self._stop = threading.Event()
        self._t = threading.Thread(
            target=self._work, args=(seq, start, end), daemon=True
        )
        self._t.start()

    def _work(self, seq, start, end):
        import queue

        try:
            for i in range(start, end):
                blob = seq[i]
                # bounded put + stop checks: if the consumer aborts its
                # frame loop (e.g. a tracker exception), close() raises the
                # stop flag and this worker exits instead of blocking on a
                # full queue forever (advisor round-2 low finding)
                while not self._stop.is_set():
                    try:
                        self._q.put(blob, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
        except BaseException as e:  # noqa: BLE001 — re-raised in consumer
            self._exc = e
        finally:
            # the sentinel MUST be delivered (a dropped sentinel deadlocks
            # the consumer at q.get() once it drains the remaining blobs —
            # hit in practice when the consumer lags the producer by >= depth
            # at end-of-sequence); retry until it lands or close() stops us
            while not self._stop.is_set():
                try:
                    self._q.put(None, timeout=0.1)
                    break
                except queue.Full:
                    continue

    def close(self):
        """Unblock and join the worker (idempotent; safe mid-iteration)."""
        import queue

        self._stop.set()
        while self._t.is_alive():
            try:  # drain so a blocked put can observe the stop flag
                self._q.get_nowait()
            except queue.Empty:
                pass
            self._t.join(timeout=0.05)

    def __iter__(self):
        while True:
            blob = self._q.get()
            if blob is None:
                if self._exc is not None:
                    raise self._exc
                return
            yield blob

    def __enter__(self):
        return self

    def __exit__(self, *exc_info):
        self.close()
        return False


def main_track(cfg, obj_detector_model=None):
    seed = int(cfg.get("seed", 333))
    np.random.seed(seed)

    if obj_detector_model is None:
        ckpt_dir = cfg.obj_detect_checkpoint_dir
        train_cfg = load_saved_config(ckpt_dir)
        model, criterion, postprocessors = build_model(train_cfg)
        from ..utils.checkpoint import CheckpointManager

        mgr = CheckpointManager(ckpt_dir)
        restored = mgr.restore()
        assert restored is not None, f"no checkpoint in {ckpt_dir}"
        params = restored["params"]
    else:
        model, params, postprocessors, train_cfg = obj_detector_model

    from ..models.postprocess import build_postprocessors

    post = build_postprocessors(train_cfg)["bbox"]
    tracker_cfg = (
        cfg.tracker_cfg.to_dict()
        if isinstance(cfg.tracker_cfg, Config)
        else dict(cfg.tracker_cfg)
    )
    # batched-mode device execution form (tracking/batched.py) — a
    # top-level track.yaml key, forwarded inside tracker_cfg
    tracker_cfg.setdefault("batch_exec", cfg.get("batch_exec", "auto"))
    if cfg.get("kinet", False) or train_cfg.get("kine", False):
        from ..tracking.kine_tracker import TrackerKinematic

        trail_len = max(int(train_cfg.track_prev_frame_range), 1)
        tracker = TrackerKinematic(
            model,
            params,
            post,
            tracker_cfg,
            num_object_queries=int(train_cfg.num_queries),
            num_track_slots=int(train_cfg.get("max_track_queries", 100)),
            trail_len=trail_len,
            trail_enc_dim=(
                int(train_cfg.encoding_dim_tracklets)
                if train_cfg.get("use_encoding_tracklets", False)
                else 0
            ),
            meta_dim=2 if train_cfg.use_class else 1,
            overflow_boxes=bool(train_cfg.get("overflow_boxes", False)),
        )
    else:
        gen_attn = bool(cfg.get("generate_attention_maps", False))
        if gen_attn:
            # attention maps need the model to sow decoder cross-attn
            # weights; vanilla DETR only (reference asserts the same,
            # tracker.py:40-42)
            import dataclasses

            assert not train_cfg.get("deformable", False), (
                "Generation of attention maps not possible for deformable "
                "DETR."
            )
            model = dataclasses.replace(model, generate_attention_maps=True)
        # single-stream latency mode: split each frame's height over N
        # chips (parallel/sp.py). The reference binds one stream to one
        # GPU (src/track.py), so it has no equivalent.
        sp_n = int(cfg.get("spatial_parallel", 0))
        spatial_mesh = None
        if sp_n > 1:
            import jax as _jax

            from ..parallel.mesh import make_mesh

            assert int(cfg.get("batch_sequences", 1)) <= 1, (
                "spatial_parallel and batch_sequences>1 are mutually "
                "exclusive serving modes"
            )
            assert len(_jax.devices()) >= sp_n, (
                f"spatial_parallel={sp_n} but only "
                f"{len(_jax.devices())} devices"
            )
            spatial_mesh = make_mesh(n_data=sp_n, n_model=1)
        tracker = Tracker(
            model,
            params,
            post,
            tracker_cfg,
            num_object_queries=int(train_cfg.num_queries),
            num_track_slots=int(train_cfg.get("max_track_queries", 100)),
            hidden_dim=int(train_cfg.hidden_dim),
            overflow_boxes=bool(train_cfg.get("overflow_boxes", False)),
            generate_attention_maps=gen_attn,
            spatial_mesh=spatial_mesh,
        )

    dataset = TrackDatasetFactory(
        cfg.dataset_name,
        root_dir=cfg.data_root_dir,
        img_transform=train_cfg.img_transform,
    )

    from ..utils import dist

    # multi-host tracking eval: round-robin the val sequences across
    # processes (reference engine.py:291-304); accums are merged via
    # all_gather below (engine.py:333-344). Single-process: a no-op split.
    world = dist.get_world_size()
    rank = dist.get_rank()
    seqs = list(dataset)[rank::world]

    time_total = 0.0
    num_frames = 0
    accums, accum_names = [], []

    batch_n = int(cfg.get("batch_sequences", 1))
    kinet_mode = cfg.get("kinet", False) or train_cfg.get("kine", False)
    if batch_n > 1 and not cfg.get("load_results_dir"):
        # throughput mode: step up to batch_n same-shape sequences through
        # ONE batched forward (tracking/batched.py). Decision logic per
        # sequence is identical to the single-stream path.
        time_total, num_frames = _track_batched(
            cfg, train_cfg, model, params, post, tracker_cfg, seqs,
            batch_n, accums, accum_names, kinet_mode=kinet_mode,
        )
        seqs = []

    for seq in seqs:
        tracker.reset()
        print(f"TRACK SEQ: {seq}", flush=True)
        start_frame = int(cfg.frame_range.start * len(seq))
        end_frame = int(cfg.frame_range.end * len(seq))
        t0 = time.time()
        results = None
        if cfg.get("load_results_dir"):
            results = seq.load_results(cfg.load_results_dir)
        kinet_mode = cfg.get("kinet", False) or train_cfg.get("kine", False)
        if not results:
            # context manager stops the worker thread even if tracker.step
            # raises mid-sequence (otherwise it blocks forever on q.put)
            with _Prefetcher(seq, start_frame, end_frame) as frames:
                for blob in frames:
                    if kinet_mode:
                        blob = _kine_blob(
                            blob, int(train_cfg.max_number_detection)
                        )
                    tracker.step(blob)
                    num_frames += 1
            results = tracker.get_results()
        time_total += time.time() - t0

        if cfg.get("interpolate", False):
            results = interpolate_tracks(results)

        if cfg.output_dir:
            seq.write_results(
                results, osp.join(cfg.output_dir, _dataset_dirname(cfg.dataset_name))
            )
            if cfg.get("write_images", False):
                from ..utils.vis import plot_sequence

                plot_sequence(
                    results, seq,
                    osp.join(cfg.output_dir, _dataset_dirname(cfg.dataset_name), str(seq)),
                    write_images=cfg.write_images,
                )

        if not seq.no_gt:
            accums.append(get_mot_accum(results, seq))
            accum_names.append(str(seq))

        print(
            f"NUM TRACKS: {len(results)} ReIDs: {tracker.num_reids}",
            flush=True,
        )

    if num_frames:
        print(
            f"RUNTIME ALL SEQS (w/o EVAL or IMG WRITE): "
            f"{time_total:.2f} s for {num_frames} frames "
            f"({num_frames / max(time_total, 1e-9):.2f} Hz)",
            flush=True,
        )
    if world > 1:
        # merge every host's accumulators (≙ reference all_gather of
        # mot_accums, engine.py:333-344) so each host reports the full
        # summary over all sequences
        gathered = dist.all_gather_objects((accums, accum_names))
        accums = [a for accs, _ in gathered for a in accs]
        accum_names = [n for _, names in gathered for n in names]
    if accums:
        summary = evaluate_mot_accums(accums, accum_names)
        print(format_summary(summary), flush=True)
        return summary
    return None


def _kine_blob(blob: dict, max_det: int) -> dict:
    """Adapt an image-sequence blob to kinematic tracker input
    (≙ TrackDatasetFactoryKinet/get_sub_dataset intent, reference
    factory.py:76-142 — its call signature is broken upstream, SURVEY §8.5)."""
    h0, w0 = blob["orig_size"]
    d = blob["dets"]
    cxcywh = np.stack(
        [
            (d[:, 0] + d[:, 2]) / 2 / w0,
            (d[:, 1] + d[:, 3]) / 2 / h0,
            (d[:, 2] - d[:, 0]) / w0,
            (d[:, 3] - d[:, 1]) / h0,
        ],
        axis=1,
    ) if len(d) else np.zeros((0, 4), np.float32)
    return {
        "detections": cxcywh.astype(np.float32),
        "metadata": blob.get("dets_conf", np.ones(len(d), np.float32))[:, None],
        "orig_size": blob["orig_size"],
        "max_detections": max_det,
        # absolute public boxes pass through: tracker_cfg.public_detections
        # filters candidate spawns against them (all-False without them)
        "dets": d,
    }


def _track_batched(
    cfg, train_cfg, model, params, post, tracker_cfg, seqs, batch_n,
    accums, accum_names, kinet_mode=False,
):
    """Group sequences by padded frame shape and run each group through a
    BatchedTracker in chunks of at most batch_n. Returns (time, frames)."""
    from ..tracking.batched import (
        BatchedTracker,
        BatchedTrackerKinematic,
        run_batched,
    )

    groups: dict[tuple, list] = {}
    for seq in seqs:
        # the kine forward is image-free (fixed-size padded detections),
        # so every sequence batches together; the image path needs equal
        # padded frame shapes (and pays one decoded frame per sequence to
        # learn them — probe the first IN-RANGE frame so the decode is
        # the frame the batch actually starts on, not a wasted seq[0])
        if kinet_mode:
            shape = ("kine",)
        else:
            probe = min(
                int(cfg.frame_range.start * len(seq)), max(len(seq) - 1, 0)
            )
            shape = tuple(seq[probe]["images"].shape)
        groups.setdefault(shape, []).append(seq)

    time_total = 0.0
    num_frames = 0
    # one BatchedTracker per chunk SIZE, reset between chunks: its jitted
    # forward is a per-function-object cache, so constructing a fresh one
    # per chunk would recompile the multi-minute flagship graph every time
    trackers_by_size: dict[int, BatchedTracker] = {}
    for shape, group in groups.items():
        for i0 in range(0, len(group), batch_n):
            chunk = group[i0 : i0 + batch_n]
            batched = trackers_by_size.get(len(chunk))
            if batched is None:
                if kinet_mode:
                    trail_len = max(
                        int(train_cfg.track_prev_frame_range), 1
                    )
                    batched = BatchedTrackerKinematic(
                        model, params, post, tracker_cfg,
                        num_object_queries=int(train_cfg.num_queries),
                        num_track_slots=int(
                            train_cfg.get("max_track_queries", 100)
                        ),
                        trail_len=trail_len,
                        trail_enc_dim=(
                            int(train_cfg.encoding_dim_tracklets)
                            if train_cfg.get("use_encoding_tracklets", False)
                            else 0
                        ),
                        meta_dim=2 if train_cfg.use_class else 1,
                        overflow_boxes=bool(
                            train_cfg.get("overflow_boxes", False)
                        ),
                        n_sequences=len(chunk),
                    )
                else:
                    batched = BatchedTracker(
                        model, params, post, tracker_cfg,
                        num_object_queries=int(train_cfg.num_queries),
                        num_track_slots=int(
                            train_cfg.get("max_track_queries", 100)
                        ),
                        hidden_dim=int(train_cfg.hidden_dim),
                        n_sequences=len(chunk),
                        overflow_boxes=bool(
                            train_cfg.get("overflow_boxes", False)
                        ),
                        generate_attention_maps=bool(
                            cfg.get("generate_attention_maps", False)
                        ),
                    )
                trackers_by_size[len(chunk)] = batched
            else:
                batched.reset()
            desc = "kine" if kinet_mode else f"{shape[1]}x{shape[2]}"
            print(
                f"TRACK BATCH ({len(chunk)} seqs, {desc}): "
                + ", ".join(str(s) for s in chunk),
                flush=True,
            )
            ranges = [
                (
                    int(cfg.frame_range.start * len(s)),
                    int(cfg.frame_range.end * len(s)),
                )
                for s in chunk
            ]
            t0 = time.time()
            prefetchers = [
                _Prefetcher(s, a, b) for s, (a, b) in zip(chunk, ranges)
            ]

            def _frames(p):
                for blob in p:
                    yield (
                        _kine_blob(blob, int(train_cfg.max_number_detection))
                        if kinet_mode
                        else blob
                    )

            try:
                run_batched(batched, [_frames(p) for p in prefetchers])
            finally:
                for p in prefetchers:
                    p.close()
            time_total += time.time() - t0
            num_frames += sum(b - a for a, b in ranges)

            for i, seq in enumerate(chunk):
                results = batched.get_results(i)
                if cfg.get("interpolate", False):
                    results = interpolate_tracks(results)
                if cfg.output_dir:
                    seq.write_results(
                        results, osp.join(cfg.output_dir, _dataset_dirname(cfg.dataset_name))
                    )
                    if cfg.get("write_images", False):
                        from ..utils.vis import plot_sequence

                        plot_sequence(
                            results, seq,
                            osp.join(
                                cfg.output_dir, _dataset_dirname(cfg.dataset_name), str(seq)
                            ),
                            write_images=cfg.write_images,
                        )
                if not seq.no_gt:
                    accums.append(get_mot_accum(results, seq))
                    accum_names.append(str(seq))
                print(
                    f"NUM TRACKS: {len(results)} "
                    f"ReIDs: {batched.trackers[i].num_reids}",
                    flush=True,
                )
    return time_total, num_frames


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="track.yaml")
    p.add_argument("--named", nargs="*", default=[])
    p.add_argument("overrides", nargs="*", default=[])
    args = p.parse_args(argv)
    cfg = load_config(
        args.config, named=args.named,
        overrides=parse_cli_overrides(args.overrides),
    )
    main_track(cfg)


if __name__ == "__main__":
    main()
