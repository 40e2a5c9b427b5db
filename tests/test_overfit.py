"""Learning-dynamics sanity: a tiny DETR must overfit one synthetic image
(loss decreases substantially) — end-to-end check that matcher, losses,
param groups and optimizer interact correctly.

The 40-step loops re-derive bit-identical loss traces on an unchanged
tree, so they go through tests/_train_cache.py like the synthetic-MOTA
gates: any source/config change retrains, repeat runs assert on the
cached trace."""
import jax
import jax.numpy as jnp

from kinet_tpu.config import load_config
from kinet_tpu.engine.state import TrainState, build_optimizer
from kinet_tpu.engine.train_step import make_train_step
from kinet_tpu.models.build import build_model
from kinet_tpu.structs import ImageBatch, Targets

from _train_cache import cached_train


def _overfit_trace(cfg, model, criterion, batch, targets, steps=40):
    """Run the overfit loop, returning (first, last, last_loss_bbox)."""

    def run():
        params = jax.jit(model.init)(jax.random.PRNGKey(1), batch, targets)
        tx = build_optimizer(cfg, params, steps_per_epoch=10_000)
        state = TrainState.create(params, tx)
        step = make_train_step(model, criterion, tx, cfg)
        first = last = losses = None
        for _ in range(steps):
            state, losses = step(state, jax.random.PRNGKey(2), batch, targets)
            if first is None:
                first = float(losses["loss"])
            last = float(losses["loss"])
        return {
            "first": first,
            "last": last,
            "loss_bbox": float(losses["loss_bbox"]),
        }

    return cached_train(
        {"recipe": "overfit_trace", "cfg": cfg.to_dict(), "steps": steps},
        run,
    )


def test_detr_overfits_single_image():
    cfg = load_config("train.yaml").replace(
        dataset="mot", backbone="resnet_test", hidden_dim=32, nheads=2,
        enc_layers=1, dec_layers=1, dim_feedforward=64, num_queries=8,
        dropout=0.0, aux_loss=False, lr=1e-3, lr_backbone=1e-4,
        clip_max_norm=0.1, weight_decay=0.0,
    )
    model, criterion, _ = build_model(cfg)
    key = jax.random.PRNGKey(0)
    batch = ImageBatch(
        images=jax.random.normal(key, (1, 64, 64, 3)),
        pad_mask=jnp.zeros((1, 64, 64), bool),
    )
    targets = Targets.create(
        jnp.asarray([[[0.3, 0.3, 0.2, 0.2], [0.7, 0.6, 0.15, 0.25]]]),
        jnp.zeros((1, 2), jnp.int32),
        jnp.ones((1, 2), bool),
        num_track_queries=0,
        hidden_dim=32,
    )
    trace = _overfit_trace(cfg, model, criterion, batch, targets)
    assert trace["last"] < trace["first"] * 0.55, trace
    # box loss specifically must shrink (localization is learning)
    assert trace["loss_bbox"] < 0.35, trace


def test_deformable_variants_overfit_single_image():
    """Accuracy guard for the encoder-MSDA perf variants (cache_prev_encoder
    + topk pruning + shared locations): a tiny Deformable DETR with all
    variants enabled must still overfit one synthetic image."""
    cfg = load_config("train.yaml", named=["train_deformable"]).replace(
        dataset="mot", backbone="resnet_test", hidden_dim=32, nheads=2,
        enc_layers=2, dec_layers=1, dim_feedforward=64, num_queries=8,
        dropout=0.0, aux_loss=False, lr=1e-3, lr_backbone=1e-4,
        clip_max_norm=0.1, weight_decay=0.0, num_feature_levels=4,
        dec_n_points=2, enc_n_points=4, with_box_refine=False,
        enc_msda_topk=4,  # prune half of the 2x4 samples
        enc_lite=True,  # Lite-DETR interleaved high-level update
        enc_lite_klevels=2,  # low-level update sees only 2 finest levels
        allow_lossy=True,  # topk is accuracy-unsafe; build_model gates it
    )
    import pytest

    with pytest.raises(ValueError, match="allow_lossy"):
        build_model(cfg.replace(allow_lossy=False))
    with pytest.warns(UserWarning, match="accuracy-unsafe"):
        model, criterion, _ = build_model(cfg)
    key = jax.random.PRNGKey(0)
    batch = ImageBatch(
        images=jax.random.normal(key, (1, 64, 64, 3)),
        pad_mask=jnp.zeros((1, 64, 64), bool),
    )
    targets = Targets.create(
        jnp.asarray([[[0.3, 0.3, 0.2, 0.2], [0.7, 0.6, 0.15, 0.25]]]),
        jnp.zeros((1, 2), jnp.int32),
        jnp.ones((1, 2), bool),
        num_track_queries=0,
        hidden_dim=32,
    )
    trace = _overfit_trace(cfg, model, criterion, batch, targets)
    assert trace["last"] < trace["first"] * 0.55, trace
