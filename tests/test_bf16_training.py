"""bf16 mixed-precision train step: fp32 master params, finite losses."""
import jax
import jax.numpy as jnp

from kinet_tpu.config import load_config
from kinet_tpu.engine.state import TrainState, build_optimizer
from kinet_tpu.engine.train_step import make_train_step
from kinet_tpu.models.build import build_model
from kinet_tpu.structs import ImageBatch, Targets


def test_bf16_train_step():
    cfg = load_config("train.yaml").replace(
        dataset="mot", backbone="resnet_test", hidden_dim=32, nheads=2,
        enc_layers=1, dec_layers=1, dim_feedforward=32, num_queries=8,
        dropout=0.0, aux_loss=False, compute_dtype="bfloat16",
    )
    model, criterion, _ = build_model(cfg)
    b = 2
    batch = ImageBatch(
        images=jax.random.normal(jax.random.PRNGKey(0), (b, 32, 32, 3)),
        pad_mask=jnp.zeros((b, 32, 32), bool),
    )
    targets = Targets.create(
        jnp.full((b, 3, 4), 0.5), jnp.zeros((b, 3), jnp.int32),
        jnp.ones((b, 3), bool), num_track_queries=0, hidden_dim=32,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch, targets)
    tx = build_optimizer(cfg, params, steps_per_epoch=10)
    state = TrainState.create(params, tx)
    step = make_train_step(model, criterion, tx, cfg)
    new_state, losses = step(state, jax.random.PRNGKey(2), batch, targets)
    assert jnp.isfinite(losses["loss"])
    # master params remain fp32
    for leaf in jax.tree_util.tree_leaves(new_state.params):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
    # params actually changed
    diff = sum(
        float(jnp.sum(jnp.abs(a - b)))
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(new_state.params),
        )
    )
    assert diff > 0
