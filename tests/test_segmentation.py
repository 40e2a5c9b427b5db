"""Mask head tests: shapes, loss integration, both detector families."""
import jax
import jax.numpy as jnp

from kinet_tpu.config import load_config
from kinet_tpu.models.build import build_model
from kinet_tpu.structs import ImageBatch, Targets


def _cfg(**over):
    cfg = load_config("train.yaml")
    base = dict(
        dataset="mot", backbone="resnet_test", hidden_dim=32, nheads=2,
        enc_layers=1, dec_layers=1, dim_feedforward=32, num_queries=6,
        dropout=0.0, masks=True, aux_loss=False,
    )
    base.update(over)
    return cfg.replace(**base)


def _batch(key, b=1, h=64, w=64, n=3, hidden=32):
    k1, k2 = jax.random.split(key)
    img = jax.random.normal(k1, (b, h, w, 3))
    pad = jnp.zeros((b, h, w), bool)
    boxes = jax.random.uniform(k2, (b, n, 4), minval=0.3, maxval=0.5)
    targets = Targets.create(
        boxes, jnp.zeros((b, n), jnp.int32), jnp.ones((b, n), bool),
        num_track_queries=0, hidden_dim=hidden,
    )
    masks = jnp.zeros((b, n, h, w)).at[:, :, 10:30, 10:30].set(1.0)
    return ImageBatch(images=img, pad_mask=pad), targets.replace(masks=masks)


def test_detr_segm_forward_and_loss():
    cfg = _cfg()
    model, criterion, _ = build_model(cfg)
    batch, targets = _batch(jax.random.PRNGKey(0))
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch, targets)
    out = jax.jit(model.apply)(params, batch, targets)
    assert "pred_masks" in out
    assert out["pred_masks"].shape[:2] == (1, 6)
    losses = criterion(out, targets)
    assert "loss_mask" in losses and "loss_dice" in losses
    assert jnp.isfinite(criterion.total_loss(losses))


def test_deformable_segm_forward():
    cfg = _cfg(deformable=True, focal_loss=True, num_feature_levels=4,
               dec_n_points=2, enc_n_points=2)
    model, criterion, _ = build_model(cfg)
    batch, targets = _batch(jax.random.PRNGKey(0))
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch, targets)
    out = jax.jit(model.apply)(params, batch, targets)
    assert out["pred_masks"].shape[:2] == (1, 6)
    losses = criterion(out, targets)
    assert jnp.isfinite(criterion.total_loss(losses))
