"""freeze_detr + load_mask_head_from_model (VERDICT r4 missing #2).

Reference semantics: with ``masks`` + ``freeze_detr`` the whole detector is
frozen before the mask head is attached (detr_segmentation.py:30-38) so a
train step updates ONLY bbox_attention/mask_head params; a second
checkpoint's mask-head subtree can be spliced in (train.py:245-254)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kinet_tpu.config import load_config
from kinet_tpu.engine.state import TrainState, build_optimizer
from kinet_tpu.engine.train_step import make_train_step
from kinet_tpu.models.build import build_model
from kinet_tpu.structs import ImageBatch, Targets


def _tiny_cfg(**over):
    return load_config("train.yaml", named=["train_mots20"]).replace(
        dataset="mot", backbone="resnet_test", hidden_dim=32, nheads=2,
        enc_layers=1, dec_layers=1, dim_feedforward=32, num_queries=6,
        max_objects=4, max_track_queries=6, dropout=0.0, aux_loss=False,
        **over,
    )


def _inputs(hidden_dim=32, t=6):
    batch = ImageBatch(
        images=jnp.zeros((1, 64, 64, 3)), pad_mask=jnp.zeros((1, 64, 64), bool)
    )
    targets = Targets.create(
        jnp.full((1, 4, 4), 0.4),
        jnp.zeros((1, 4), jnp.int32),
        jnp.array([[True, True, False, False]]),
        num_track_queries=t, hidden_dim=hidden_dim,
    ).replace(masks=jnp.zeros((1, 4, 64, 64)).at[:, :, 8:24, 8:24].set(1.0))
    return batch, targets


def _flat(params):
    return {
        "/".join(str(getattr(p, "key", p)) for p in path): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }


def test_freeze_detr_train_step_updates_only_mask_head():
    cfg = _tiny_cfg()
    assert cfg.freeze_detr and cfg.masks  # train_mots20.yaml sets both
    model, criterion, _ = build_model(cfg)
    batch, targets = _inputs()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch, targets)
    tx = build_optimizer(cfg, params, steps_per_epoch=100)
    state = TrainState.create(params, tx)
    step = make_train_step(model, criterion, tx, cfg)
    new_state, losses = step(
        state, jax.random.PRNGKey(1), batch, targets, batch, targets
    )
    assert np.isfinite(float(losses["loss"]))

    before, after = _flat(params), _flat(new_state.params)
    changed = {k for k in before if not np.array_equal(before[k], after[k])}
    mask_head_keys = {
        k for k in before if "bbox_attention" in k or "mask_head" in k
    }
    # every DETR param is bit-unchanged...
    frozen_changed = changed - mask_head_keys
    assert not frozen_changed, sorted(frozen_changed)[:5]
    # ...and the mask head actually trains
    assert changed & mask_head_keys, "mask head received no update"


def test_no_freeze_updates_detector_params():
    cfg = _tiny_cfg(freeze_detr=False)
    model, criterion, _ = build_model(cfg)
    batch, targets = _inputs()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch, targets)
    tx = build_optimizer(cfg, params, steps_per_epoch=100)
    state = TrainState.create(params, tx)
    step = make_train_step(model, criterion, tx, cfg)
    new_state, _ = step(
        state, jax.random.PRNGKey(1), batch, targets, batch, targets
    )
    before, after = _flat(params), _flat(new_state.params)
    changed = {k for k in before if not np.array_equal(before[k], after[k])}
    assert any(
        "bbox_attention" not in k and "mask_head" not in k for k in changed
    )


def test_load_mask_head_from_model_splices(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    import orbax.checkpoint as ocp

    from kinet_tpu.utils.checkpoint import load_for_resume

    cfg = _tiny_cfg()
    model, _, _ = build_model(cfg)
    batch, targets = _inputs()
    params_a = jax.jit(model.init)(jax.random.PRNGKey(0), batch, targets)
    params_b = jax.jit(model.init)(jax.random.PRNGKey(7), batch, targets)

    ckpt_dir = tmp_path / "mask_head_ckpt"
    ocp.PyTreeCheckpointer().save(
        str(ckpt_dir.resolve()),
        {"params": jax.tree_util.tree_map(np.asarray, params_b)},
    )

    cfg = cfg.replace(load_mask_head_from_model=str(ckpt_dir), resume=None)
    spliced, opt_state, start = load_for_resume(cfg, params_a, None)
    assert opt_state is None and start == int(cfg.start_epoch)

    fa, fb, fs = _flat(params_a), _flat(params_b), _flat(spliced)
    for k in fa:
        if "bbox_attention" in k or "mask_head" in k:
            assert np.array_equal(fs[k], fb[k]), k  # spliced from ckpt B
        else:
            assert np.array_equal(fs[k], fa[k]), k  # detector untouched
