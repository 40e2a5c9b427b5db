"""Tests for fixed-shape track-query training augmentation."""
import jax
import jax.numpy as jnp
import numpy as np

from kinet_tpu.structs import Targets
from kinet_tpu.tracking.train_augment import add_track_queries_to_targets


def _setup(b=2, n=6, q=10, d=16, t=8, seed=0):
    rng = np.random.default_rng(seed)
    prev_valid = np.zeros((b, n), bool)
    prev_valid[:, :4] = True
    prev_tids = np.full((b, n), -1, np.int64)
    prev_tids[:, :4] = [[10, 11, 12, 13]] * b
    cur_valid = np.zeros((b, n), bool)
    cur_valid[:, :3] = True
    # current frame: tracks 11 and 13 survive, 10/12 vanish, 99 is new
    cur_tids = np.full((b, n), -1, np.int64)
    cur_tids[:, :3] = [[11, 13, 99]] * b

    prev_targets = Targets.create(
        boxes=rng.uniform(0.2, 0.8, (b, n, 4)).astype(np.float32),
        labels=np.zeros((b, n), np.int32),
        valid=prev_valid,
        track_ids=prev_tids,
        num_track_queries=t,
        hidden_dim=d,
    )
    targets = Targets.create(
        boxes=rng.uniform(0.2, 0.8, (b, n, 4)).astype(np.float32),
        labels=np.zeros((b, n), np.int32),
        valid=cur_valid,
        track_ids=cur_tids,
        num_track_queries=t,
        hidden_dim=d,
    )
    q4t_prev = np.full((b, n), -1, np.int32)
    q4t_prev[:, :4] = [[0, 3, 5, 7]] * b
    prev_out = {
        "hs_embed": jnp.asarray(rng.normal(size=(b, q, d)).astype(np.float32)),
        "pred_boxes": jnp.asarray(rng.uniform(0, 1, (b, q, 4)).astype(np.float32)),
    }
    return targets, prev_targets, jnp.asarray(q4t_prev), prev_out


def test_all_kept_no_fps():
    targets, prev_targets, q4t, prev_out = _setup()
    out = add_track_queries_to_targets(
        jax.random.PRNGKey(0), targets, prev_targets, q4t, prev_out,
        false_positive_prob=0.0, false_negative_prob=0.0,
    )
    out = jax.tree_util.tree_map(np.asarray, out)
    # fn_prob=0 -> all 4 matched prev targets become track queries
    assert out.track_query_mask.sum(axis=1).tolist() == [4, 4]
    # fp flags: exactly the 2 vanished tracks (10, 12) per image may be
    # flagged; the FP count injected is 0
    assert out.track_query_fp_mask.sum(axis=1).tolist() == [2, 2]
    # every active slot embeds a real prev query row
    for b in range(2):
        for s in range(8):
            if out.track_query_mask[b, s]:
                emb = out.track_query_embeds[b, s]
                hs = np.asarray(prev_out["hs_embed"][b])
                assert any(np.allclose(emb, hs[qq]) for qq in [0, 3, 5, 7])
    # match ids point at current slots holding track ids 11/13
    mids = out.track_query_match_ids
    active_tp = out.track_query_mask & ~out.track_query_fp_mask
    assert set(mids[active_tp].tolist()) == {0, 1}


def test_fn_simulation_reduces_count():
    targets, prev_targets, q4t, prev_out = _setup()
    counts = []
    for seed in range(12):
        out = add_track_queries_to_targets(
            jax.random.PRNGKey(seed), targets, prev_targets, q4t, prev_out,
            false_positive_prob=0.0, false_negative_prob=0.4,
        )
        counts.append(int(np.asarray(out.track_query_mask).sum(axis=1)[0]))
    assert min(counts) < 4  # FN simulation sometimes drops tracks
    assert max(counts) <= 4


def test_fp_injection():
    targets, prev_targets, q4t, prev_out = _setup()
    saw_fp_query = False
    for seed in range(20):
        out = add_track_queries_to_targets(
            jax.random.PRNGKey(seed), targets, prev_targets, q4t, prev_out,
            false_positive_prob=1.0, false_negative_prob=0.0,
        )
        out_np = jax.tree_util.tree_map(np.asarray, out)
        nactive = out_np.track_query_mask.sum(axis=1)
        if (nactive > 4).any():
            saw_fp_query = True
            # FP slots must embed *unmatched* prev queries
            for b in range(2):
                for s in range(4, int(nactive[b])):
                    emb = out_np.track_query_embeds[b, s]
                    hs = np.asarray(prev_out["hs_embed"][b])
                    used = {0, 3, 5, 7}
                    src = [qq for qq in range(10) if np.allclose(emb, hs[qq])]
                    assert src and src[0] not in used
    assert saw_fp_query


def test_static_shape_and_jit():
    targets, prev_targets, q4t, prev_out = _setup()

    @jax.jit
    def run(rng):
        return add_track_queries_to_targets(
            rng, targets, prev_targets, q4t, prev_out, 0.1, 0.4
        )

    out = run(jax.random.PRNGKey(0))
    assert out.track_query_embeds.shape == (2, 8, 16)
    out2 = run(jax.random.PRNGKey(1))  # cached, no recompile for new rng
    assert out2.track_query_mask.shape == (2, 8)
