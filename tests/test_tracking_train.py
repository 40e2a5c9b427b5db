"""End-to-end tracking training step: prev forward -> track-query injection
-> current forward -> criterion -> grads, all inside one jit."""
import jax
import jax.numpy as jnp
import numpy as np

from kinet_tpu.config import load_config
from kinet_tpu.models.build import build_model
from kinet_tpu.structs import ImageBatch, Targets
from kinet_tpu.tracking.train_augment import tracking_train_forward


def _mk(key, b=2, h=64, w=64, n=4, hidden=32, t=6, tid_base=0):
    k1, k2 = jax.random.split(key)
    images = jax.random.normal(k1, (b, h, w, 3), jnp.float32)
    pad = jnp.zeros((b, h, w), bool)
    boxes = jax.random.uniform(k2, (b, n, 4), minval=0.2, maxval=0.5)
    labels = jnp.zeros((b, n), jnp.int32)
    valid = jnp.ones((b, n), bool).at[:, 3:].set(False)
    tids = jnp.arange(n)[None, :].astype(jnp.int32) + tid_base
    tids = jnp.where(valid, jnp.broadcast_to(tids, (b, n)), -1)
    targets = Targets.create(
        boxes, labels, valid, track_ids=tids, num_track_queries=t, hidden_dim=hidden
    )
    return ImageBatch(images=images, pad_mask=pad), targets


def test_tracking_train_step_jit_and_grad():
    cfg = load_config("train.yaml").replace(
        dataset="mot",
        backbone="resnet_test",
        hidden_dim=32,
        nheads=2,
        enc_layers=1,
        dec_layers=1,
        dim_feedforward=64,
        num_queries=10,
        max_track_queries=6,
        dropout=0.0,
        tracking=True,
        aux_loss=False,
    )
    model, criterion, _ = build_model(cfg)
    batch, targets = _mk(jax.random.PRNGKey(0))
    prev_batch, prev_targets = _mk(jax.random.PRNGKey(1))
    params = jax.jit(model.init)(jax.random.PRNGKey(2), batch, targets)

    @jax.jit
    def step(params, rng):
        def loss_fn(p):
            out, aug_t = tracking_train_forward(
                model, p, rng, batch, targets, prev_batch, prev_targets,
                criterion, deterministic=True,
            )
            losses = criterion(out, aug_t)
            return criterion.total_loss(losses), (losses, aug_t)

        (total, (losses, aug_t)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        return total, losses, aug_t, grads

    total, losses, aug_t, grads = step(params, jax.random.PRNGKey(3))
    assert jnp.isfinite(total)
    # same track ids in both frames -> some track queries usually injected
    n_tq = int(np.asarray(aug_t.track_query_mask).sum())
    assert 0 <= n_tq <= 12
    gnorm = sum(jnp.sum(jnp.abs(g)) for g in jax.tree_util.tree_leaves(grads))
    assert jnp.isfinite(gnorm) and gnorm > 0
    # second call with a new rng hits the jit cache (no assert possible on
    # recompiles here, but shape stability is implied by identical structure)
    total2, *_ = step(params, jax.random.PRNGKey(4))
    assert jnp.isfinite(total2)


def test_tracking_with_prev_prev():
    cfg = load_config("train.yaml").replace(
        dataset="mot",
        backbone="resnet_test",
        hidden_dim=32,
        nheads=2,
        enc_layers=1,
        dec_layers=1,
        dim_feedforward=64,
        num_queries=10,
        max_track_queries=6,
        dropout=0.0,
        tracking=True,
        aux_loss=False,
    )
    model, criterion, _ = build_model(cfg)
    batch, targets = _mk(jax.random.PRNGKey(0))
    prev_batch, prev_targets = _mk(jax.random.PRNGKey(1))
    pp_batch, pp_targets = _mk(jax.random.PRNGKey(5))
    params = jax.jit(model.init)(jax.random.PRNGKey(2), batch, targets)
    out, aug_t = tracking_train_forward(
        model, params, jax.random.PRNGKey(3), batch, targets,
        prev_batch, prev_targets, criterion,
        prev_prev_batch=pp_batch, prev_prev_targets=pp_targets,
        deterministic=True,
    )
    losses = criterion(out, aug_t)
    assert jnp.isfinite(criterion.total_loss(losses))
