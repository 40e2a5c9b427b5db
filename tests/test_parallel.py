"""Multi-device (8× virtual CPU) data-parallel train step + driver contract."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_mesh_creation():
    from kinet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("data", "model")


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_optimizer_param_groups():
    from kinet_tpu.config import load_config
    from kinet_tpu.engine.state import param_labels
    from kinet_tpu.models.build import build_model
    from kinet_tpu.structs import ImageBatch, Targets

    cfg = load_config("train.yaml", named=["train_deformable"]).replace(
        dataset="mot", backbone="resnet_test", hidden_dim=32, nheads=2,
        enc_layers=1, dec_layers=1, dim_feedforward=32, num_queries=4,
        dropout=0.0, num_feature_levels=2,
    )
    model, _, _ = build_model(cfg)
    img = jnp.zeros((1, 32, 32, 3))
    batch = ImageBatch(images=img, pad_mask=jnp.zeros((1, 32, 32), bool))
    targets = Targets.create(
        jnp.full((1, 2, 4), 0.5), jnp.zeros((1, 2), jnp.int32),
        jnp.ones((1, 2), bool), num_track_queries=0, hidden_dim=32,
    )
    params = model.init(jax.random.PRNGKey(0), batch, targets)
    labels = param_labels(params)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    groups = {}
    for path, lab in flat:
        groups.setdefault(lab, []).append(
            "/".join(str(getattr(p, "key", p)) for p in path)
        )
    assert "backbone" in groups and "frozen" in groups and "base" in groups
    assert "linear_proj" in groups  # sampling_offsets exist in deformable
    # conv1/layer1 frozen; layer2+ convs trainable; BN always frozen
    assert any("layer2" in p and "conv" in p for p in groups["backbone"])
    assert all("layer1_" not in p for p in groups["backbone"])
    assert any("conv1" in p for p in groups["frozen"])
    for lab, paths in groups.items():
        if lab != "frozen":
            assert all("running_" not in p for p in paths), (lab,)
            assert all(
                not any(s in p.split("/") for s in ("bn1", "bn2", "bn3"))
                for p in paths
            ), lab
