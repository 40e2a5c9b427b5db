"""End-to-end KINEMATIC tracker equivalence vs the LIVE torch reference.

Completes the tracker-equivalence trio (image: test_ref_parity_tracker.py,
MOTS: test_ref_parity_segm_tracker.py): the reference's `TrackerKinematic`
state machine (/root/reference/src/trackformer/models/tracker.py:580-1053)
runs side-by-side with kinet_tpu's rebuild on the SAME bridged dual-stream
KineT weights and detection streams, asserting per-frame track/inactive id
agreement plus result (bbox/score/obj_ind) equivalence.

Configuration is the reference's PRODUCTION kinematic path
(cfgs/train_kinet.yaml: use_encoding_tracklets=False -> IdentityEncoding raw
trails; use_class=False -> dim_metadata=1), which is the only path that can
run at all — the sine-encoding path crashes in both the tracker
(`SineEncodingTracklet(...)` already flattens, then tracker.py:660 flattens
again) and the train mixin.

Reference defects found by this harness (patched here with the evident
intent, not replicated in the rebuild — documented in PARITY.md):
- detr.py:395: with track queries the METADATA query embedding concatenates
  `query_embed_det` (already track-extended, so the streams end up with
  mismatched lengths and the forward crashes) — evident intent is
  `query_embed_metadata`; patched by a one-token source rewrite.
- tracker.py:873: `add_tracks` passes `confidence=` to
  `TrackKinematic.__init__`, which has no such parameter (`metadata` is the
  evident intent) — every new kinematic track raises TypeError.
- tracker.py:985/1021: `last_score` trail entries are stored as 0-d scalars
  (`metadata[0]`), but `step` indexes the stacked trail as 3-D
  (`[:, :, :self.dim_metadata]`, tracker.py:661) — IndexError whenever a
  track exists; evident intent is 1-d `metadata[:1]` rows.
- tracker.py:92-93 + 1099-1104: `move_tracks_to_inactive` calls
  `repeat_last_pos`, which `TrackKinematic` names `repeat_last_state`
  (SURVEY §8.8) — AttributeError on the first termination.
"""
import sys

import numpy as np
import pytest
import torch

import test_ref_parity  # noqa: F401  installs torchvision/pycocotools stubs
import test_ref_parity_tracker  # noqa: F401  installs torchvision.ops.boxes impls

import jax
import jax.numpy as jnp

D, HEADS, FF, Q, NC = 32, 2, 64, 6, 20
TRAIL = 3  # track_prev_frame_range
T_SLOTS = 12
MAXDET = 8
H, W = 120, 160  # orig_size the boxes are reported in


def _patch_ref_forward_intent():
    """detr.py:395 evident intent: the metadata stream concatenates its OWN
    query embedding (one-token source rewrite, asserted unique)."""
    import inspect
    import re
    import textwrap

    import trackformer.models.detr as rd

    cls = rd.KinematicDetectorTransformer
    if getattr(cls, "_kinet_intent_patched", False):
        return
    src = textwrap.dedent(inspect.getsource(cls.forward))
    fixed, n = re.subn(
        r"track_query_embed_metadata,(\s*\n\s*)query_embed_det\]",
        r"track_query_embed_metadata,\1query_embed_metadata]",
        src,
    )
    assert n == 1, f"defective concat not found (n={n})"
    ns = dict(vars(rd))
    exec(compile(fixed, "<detr.py:337 intent-patched>", "exec"), ns)
    cls.forward = ns["forward"]
    cls._kinet_intent_patched = True


def _patch_ref_tracker_defects():
    from trackformer.models.tracker import TrackerKinematic as RefTrackerK
    from trackformer.models.tracker import TrackKinematic as RefTrackK

    if getattr(RefTrackK, "_kinet_intent_patched", False):
        return

    orig_init = RefTrackK.__init__

    def _init(self, pos, pos_rel=None, metadata=None, metadata_encoded=None,
              pos_encoded=None, track_id=None, obj_ind=None, mask=None,
              confidence=None):
        if metadata is None:
            metadata = confidence  # add_tracks passes confidence= (evident intent)
        metadata = torch.atleast_1d(metadata)
        orig_init(self, pos, pos_rel, metadata, metadata_encoded,
                  pos_encoded, track_id, obj_ind, mask)
        # 1-d [1] trail entries so step's [:, :, :dim_metadata] (tracker.py
        # :661) and manage_*'s .view(1, n, dim) both work
        self.last_score.clear()
        self.last_score.append(metadata[:1].clone())

    orig_update = RefTrackK.update_state

    def _update_state(self, pos, relative_pos, metadata, encoding_pos,
                      encoding_metadata):
        orig_update(self, pos, relative_pos, metadata, encoding_pos,
                    encoding_metadata)
        self.last_score.pop()
        self.last_score.append(torch.atleast_1d(metadata)[:1].clone())

    RefTrackK.__init__ = _init
    RefTrackK.update_state = _update_state
    # SURVEY §8.8 naming drift: parent move_tracks_to_inactive calls
    # repeat_last_pos
    RefTrackK.repeat_last_pos = RefTrackK.repeat_last_state
    RefTrackK._kinet_intent_patched = True
    assert RefTrackerK  # imported for side effects / clarity


def _build_ref_model(seed=5):
    from trackformer.models.backbone import Joiner, Kinet_Backbone
    from trackformer.models.detr import (
        KinematicDetectorTransformer as RefModel,
    )
    from trackformer.models.position_encoding import (
        PositionEmbeddingSineDetections,
    )
    from trackformer.models.transformer import DualKinematicTransformer

    _patch_ref_forward_intent()
    torch.manual_seed(seed)
    pos_enc = PositionEmbeddingSineDetections(D // 2, max_detections=MAXDET)
    back_det = Joiner(Kinet_Backbone(4, [256, 512, D]), pos_enc)
    back_meta = Joiner(Kinet_Backbone(1, [16, 64, D]), pos_enc)
    transformer = DualKinematicTransformer(
        d_model=D, nhead=HEADS, num_encoder_layers=1, num_decoder_layers=1,
        dim_feedforward=FF, dropout=0.0, normalize_before=False,
        return_intermediate_dec=True,
    )
    model = RefModel(
        [back_det, back_meta], transformer, num_classes=NC, num_queries=Q,
        aux_loss=False, dim_tracklets_det=TRAIL * 4,
        dim_tracklets_metadata=TRAIL * 1,
    ).eval()
    with torch.no_grad():
        # one informative class (same recipe as the image harness: row 0
        # spread mildly, everything else silenced; boxes widened without
        # entering the chaotic regime)
        model.class_embed.weight.mul_(0.0)
        model.class_embed.bias.mul_(0.0)
        torch.manual_seed(11)
        model.class_embed.weight[0].normal_(
            0.0, 4.0 / model.class_embed.in_features ** 0.5
        )
        model.class_embed.bias[0] += 2.0
        model.bbox_embed.layers[-1].weight.mul_(8.0)
        model.bbox_embed.layers[-1].bias.mul_(0.0)
    return model


@pytest.fixture(scope="module")
def kine_bridged_pair():
    from kinet_tpu.config import load_config
    from kinet_tpu.models.build import build_model
    from kinet_tpu.structs import KineBatch, Targets
    from kinet_tpu.tools.import_torch_weights import import_state_dict

    ref_model = _build_ref_model()
    sd = dict(ref_model.state_dict())

    cfg = load_config("train.yaml", named=["train_kinet"]).replace(
        dataset="mot_kine", hidden_dim=D, nheads=HEADS, dim_feedforward=FF,
        num_queries=Q, num_classes_kine=NC, dropout=0.0,
        max_number_detection=MAXDET, max_track_queries=T_SLOTS,
        track_prev_frame_range=TRAIL, use_encoding_tracklets=False,
        tracking=True, aux_loss=False,
    )
    model, _, _ = build_model(cfg)
    assert type(model).__name__ == "KinematicDetectorTransformer"

    e_dim = TRAIL * 4 + TRAIL * 1
    kb0 = KineBatch(
        detections=jnp.zeros((1, MAXDET, 4)),
        metadata=jnp.zeros((1, MAXDET, 1)),
        pad_mask=jnp.zeros((1, MAXDET), bool),
    )
    tg0 = Targets.create(
        jnp.zeros((1, 1, 4)), jnp.zeros((1, 1), jnp.int32),
        jnp.zeros((1, 1), bool),
        num_track_queries=T_SLOTS, hidden_dim=e_dim,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), kb0, tg0)
    new_params, report = import_state_dict(sd, params, nheads=HEADS)
    dead = [k for k in report["unmapped"] if ".linear2." in k and "branch" in k]
    assert len(report["unmapped"]) == len(dead), report["unmapped"]
    return ref_model, model, new_params


def _trails(rng, n_tracks):
    """Random plausible trails: det trail [T, TRAIL, 4] cxcywh + conf trail
    [T, TRAIL, 1]."""
    base = rng.uniform(0.25, 0.75, size=(n_tracks, 1, 4)).astype(np.float32)
    drift = rng.normal(0, 0.02, size=(n_tracks, TRAIL, 4)).astype(np.float32)
    det_trail = np.clip(base + drift, 0.05, 0.95)
    det_trail[..., 2:] = np.clip(det_trail[..., 2:], 0.05, 0.4)
    meta_trail = rng.uniform(0.5, 1.0, size=(n_tracks, TRAIL, 1)).astype(
        np.float32
    )
    return det_trail, meta_trail


def test_kine_forward_parity_with_track_queries(kine_bridged_pair):
    """Dual-stream forward parity INCLUDING the track-query trail path
    (reference detr.py:370-403 under the evident-intent patch) — the
    existing test_ref_parity_kine.py covers only the no-track forward."""
    from kinet_tpu.structs import KineBatch, Targets

    ref_model, model, params = kine_bridged_pair
    rng = np.random.default_rng(3)
    k, n_tq = 5, 3
    dets = rng.uniform(0.1, 0.9, size=(1, k, 4)).astype(np.float32)
    meta = rng.uniform(0.4, 1.0, size=(1, k, 1)).astype(np.float32)
    det_trail, meta_trail = _trails(rng, n_tq)

    # ---- reference ----
    from trackformer.util.misc import NestedTensor

    class _Samples:
        detections = NestedTensor(
            torch.from_numpy(dets), torch.zeros(1, k, dtype=torch.bool)
        )
        metadata = NestedTensor(
            torch.from_numpy(meta), torch.zeros(1, k, dtype=torch.bool)
        )

    target = {
        "track_query_hs_embeds_det": torch.from_numpy(
            det_trail.reshape(n_tq, TRAIL * 4)
        ),
        "track_query_hs_embeds_meta": torch.from_numpy(
            meta_trail.reshape(n_tq, TRAIL * 1)
        ),
    }
    with torch.no_grad():
        out_r, *_ = ref_model(_Samples(), [target])
    lr = out_r["pred_logits"][0].numpy()
    br = out_r["pred_boxes"][0].numpy()

    # ---- rebuild ----
    e_dim = TRAIL * 4 + TRAIL * 1
    embeds = np.zeros((1, T_SLOTS, e_dim), np.float32)
    embeds[0, :n_tq, : TRAIL * 4] = det_trail.reshape(n_tq, -1)
    embeds[0, :n_tq, TRAIL * 4:] = meta_trail.reshape(n_tq, -1)
    mask = np.zeros((1, T_SLOTS), bool)
    mask[0, :n_tq] = True

    dets_p = np.zeros((1, MAXDET, 4), np.float32)
    dets_p[0, :k] = dets[0]
    meta_p = np.zeros((1, MAXDET, 1), np.float32)
    meta_p[0, :k] = meta[0]
    pad = np.ones((1, MAXDET), bool)
    pad[0, :k] = False

    kb = KineBatch(
        detections=jnp.asarray(dets_p), metadata=jnp.asarray(meta_p),
        pad_mask=jnp.asarray(pad),
    )
    tg = Targets.create(
        jnp.zeros((1, 1, 4)), jnp.zeros((1, 1), jnp.int32),
        jnp.zeros((1, 1), bool),
        num_track_queries=T_SLOTS, hidden_dim=e_dim,
    ).replace(
        track_query_embeds=jnp.asarray(embeds),
        track_query_mask=jnp.asarray(mask),
    )
    out_m = jax.jit(model.apply)(params, kb, tg)
    lm = np.asarray(out_m["pred_logits"][0])
    bm = np.asarray(out_m["pred_boxes"][0])

    # my layout: [T_SLOTS slots | Q]; ref: [n_tq | Q]
    np.testing.assert_allclose(lm[:n_tq], lr[:n_tq], atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(lm[T_SLOTS:], lr[n_tq:], atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(bm[:n_tq], br[:n_tq], atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(bm[T_SLOTS:], br[n_tq:], atol=2e-3, rtol=2e-3)


def _ref_tracker(ref_model, tracker_cfg):
    from trackformer.models.tracker import TrackerKinematic as RefTrackerK

    _patch_ref_tracker_defects()

    class _Args:
        use_class = False
        use_empty_start = False
        track_prev_frame_range = TRAIL
        use_encoding_tracklets = False
        encoding_dim_tracklets = 8

    t = RefTrackerK(
        ref_model, {"bbox": _RefPostProcess()}, tracker_cfg, _Args(),
        generate_attention_maps=False,
    )
    t.reset()
    return t


def _RefPostProcess():
    from trackformer.models.detr import PostProcess

    return PostProcess()


def _scene(rng, n_frames, n_obj=4, drop_spans=()):
    """Linear-motion objects with jittered detections; drop_spans:
    [(obj, f0, f1)] frames where that object's detection is missing."""
    base = rng.uniform(0.25, 0.7, size=(n_obj, 4)).astype(np.float32)
    base[:, 2:] = rng.uniform(0.1, 0.25, size=(n_obj, 2))
    vel = rng.normal(0, 0.01, size=(n_obj, 2)).astype(np.float32)
    frames = []
    for f in range(n_frames):
        dets, confs = [], []
        for o in range(n_obj):
            if any(o == d[0] and d[1] <= f < d[2] for d in drop_spans):
                continue
            b = base[o].copy()
            b[:2] = np.clip(b[:2] + vel[o] * f + rng.normal(0, 0.004, 2), 0.1, 0.9)
            dets.append(np.clip(b, 0.02, 0.98))
            confs.append([rng.uniform(0.6, 1.0)])
        frames.append(
            (np.asarray(dets, np.float32), np.asarray(confs, np.float32))
        )
    return frames


def _run_pair(kine_bridged_pair, tracker_cfg, frames):
    from trackformer.models.tracker import collate_input

    from kinet_tpu.models.postprocess import postprocess as my_post
    from kinet_tpu.tracking.kine_tracker import TrackerKinematic as MyTracker

    ref_model, model, params = kine_bridged_pair
    ref_tracker = _ref_tracker(ref_model, tracker_cfg)
    my_tracker = MyTracker(
        model, params, my_post, tracker_cfg,
        num_object_queries=Q, num_track_slots=T_SLOTS, trail_len=TRAIL,
        trail_enc_dim=0, meta_dim=1, n_classes=tracker_cfg["n_classes"],
    )

    for f, (dets, confs) in enumerate(frames):
        sample = collate_input(
            torch.from_numpy(dets), torch.from_numpy(confs)
        )
        labels = {"orig_size": torch.tensor([float(H), float(W)])}
        with torch.no_grad():
            ref_tracker.step((sample, [labels]))
        my_tracker.step(
            {
                "detections": dets,
                "metadata": confs,
                "orig_size": (H, W),
                "max_detections": MAXDET,
            }
        )
        # the rebuild's track-slot budget must cover the scenario
        n_total = len(ref_tracker.tracks) + len(ref_tracker.inactive_tracks)
        assert n_total <= T_SLOTS, (f, n_total)
        rids = sorted(t.id for t in ref_tracker.tracks)
        mids = sorted(t.id for t in my_tracker.tracks)
        assert rids == mids, (f, rids, mids)
        r_in = sorted(t.id for t in ref_tracker.inactive_tracks)
        m_in = sorted(t.id for t in my_tracker.inactive_tracks)
        assert r_in == m_in, (f, r_in, m_in)

    res_ref = ref_tracker.get_results()
    res_my = my_tracker.get_results()
    assert sorted(res_ref.keys()) == sorted(res_my.keys())
    for tid in res_ref:
        fr_r, fr_m = res_ref[tid], res_my[tid]
        assert sorted(fr_r.keys()) == sorted(fr_m.keys()), (
            tid, sorted(fr_r), sorted(fr_m)
        )
        for f in fr_r:
            np.testing.assert_allclose(
                fr_m[f]["bbox"], np.asarray(fr_r[f]["bbox"]), atol=5e-2,
                rtol=0,
            )
            assert abs(float(fr_m[f]["score"]) - float(fr_r[f]["score"])) < 2e-3
            assert fr_m[f]["obj_ind"] == int(fr_r[f]["obj_ind"])
    assert ref_tracker.num_reids == my_tracker.num_reids
    return ref_tracker, my_tracker


def test_kine_tracker_state_machine_equivalence(kine_bridged_pair):
    """16-frame rollout (reference tracker.py:626-856): spawns via object
    rows, trail-fed track rows, terminations -> inactive, track-row reid
    revival, track NMS and detection NMS."""
    cfg = dict(
        detection_obj_score_thresh=0.68, track_obj_score_thresh=0.80,
        detection_nms_thresh=0.5, track_nms_thresh=0.6,
        public_detections=False, inactive_patience=3,
        reid_sim_threshold=20.0, reid_sim_only=False, reid_score_thresh=0.76,
        reid_greedy_matching=False, prev_frame_dist=1, steps_termination=1,
        n_classes=1,
    )
    rng = np.random.default_rng(21)
    frames = _scene(
        rng, 16, n_obj=4, drop_spans=((1, 5, 8), (3, 9, 11))
    )
    ref_tracker, my_tracker = _run_pair(kine_bridged_pair, cfg, frames)
    # the scenario must actually exercise the machinery
    assert len(ref_tracker.get_results()) >= 3
    assert ref_tracker.num_reids >= 1


def test_kine_tracker_equivalence_persistent_tracks(kine_bridged_pair):
    """Second rollout with track-NMS off: long-lived trail-fed tracks
    (16-frame survivor) alongside spawn churn and detection NMS."""
    cfg = dict(
        detection_obj_score_thresh=0.70, track_obj_score_thresh=0.76,
        detection_nms_thresh=0.9, track_nms_thresh=0.0,
        public_detections=False, inactive_patience=3,
        reid_sim_threshold=20.0, reid_sim_only=False, reid_score_thresh=0.72,
        reid_greedy_matching=False, prev_frame_dist=1, steps_termination=2,
        n_classes=1,
    )
    rng = np.random.default_rng(21)
    frames = _scene(
        rng, 16, n_obj=4, drop_spans=((1, 5, 8), (3, 9, 11))
    )
    ref_tracker, _ = _run_pair(kine_bridged_pair, cfg, frames)
    lengths = [len(fr) for fr in ref_tracker.get_results().values()]
    assert max(lengths) == 16  # a track that survives the full rollout
    assert ref_tracker.track_num >= 20  # plus real spawn churn
