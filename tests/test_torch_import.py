"""Torch->flax weight conversion numerics: conv and MHA transforms verified
against torch ops directly; end-to-end state-dict import coverage."""
import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp
import flax.linen as nn

from kinet_tpu.tools.import_torch_weights import import_state_dict, _mha_paths


def test_conv_kernel_transform():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 3, 7, 7)).astype(np.float32)  # torch OIHW
    x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), stride=2,
                   padding=3).numpy()
    conv = nn.Conv(8, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                   use_bias=False)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}}
    out = conv.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=2e-4, atol=2e-4
    )


def test_mha_transform_matches_torch():
    d, heads, L = 16, 4, 6
    rng = np.random.default_rng(1)
    mha = torch.nn.MultiheadAttention(d, heads, batch_first=True)
    q = rng.normal(size=(1, L, d)).astype(np.float32)
    with torch.no_grad():
        ref, _ = mha(torch.from_numpy(q), torch.from_numpy(q), torch.from_numpy(q))
    ref = ref.numpy()

    paths = _mha_paths(
        (), mha.in_proj_weight.detach().numpy(),
        mha.in_proj_bias.detach().numpy(),
        mha.out_proj.weight.detach().numpy(),
        mha.out_proj.bias.detach().numpy(), heads,
    )
    flax_params = {
        "params": {
            name: {leaf: jnp.asarray(v)}
            for (name, leaf), v in paths.items()
        }
    }
    # merge nested dicts properly
    tree = {}
    for (name, leaf), v in paths.items():
        tree.setdefault(name, {})[leaf] = jnp.asarray(v)
    attn = nn.MultiHeadDotProductAttention(
        num_heads=heads, qkv_features=d, out_features=d, deterministic=True
    )
    out = attn.apply({"params": tree}, jnp.asarray(q), jnp.asarray(q),
                     jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_full_state_dict_import():
    """Synthetic reference-named state dict fully maps onto a tiny DETR."""
    from kinet_tpu.config import load_config
    from kinet_tpu.models.build import build_model
    from kinet_tpu.structs import ImageBatch, Targets

    cfg = load_config("train.yaml").replace(
        dataset="mot", backbone="resnet_test", hidden_dim=32, nheads=2,
        enc_layers=1, dec_layers=1, dim_feedforward=32, num_queries=4,
        dropout=0.0, aux_loss=False,
    )
    model, _, _ = build_model(cfg)
    b = ImageBatch(images=jnp.zeros((1, 32, 32, 3)),
                   pad_mask=jnp.zeros((1, 32, 32), bool))
    t = Targets.create(jnp.full((1, 2, 4), 0.5), jnp.zeros((1, 2), jnp.int32),
                       jnp.ones((1, 2), bool), num_track_queries=0,
                       hidden_dim=32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), b, t)

    rng = np.random.default_rng(2)
    d = 32

    def t_(shape, positive=False):
        x = rng.normal(size=shape).astype(np.float32)
        return np.abs(x) + 0.5 if positive else x

    sd = {}
    # backbone (resnet_test: 1 block per stage, widths 64/128/256/512)
    sd["backbone.0.body.conv1.weight"] = t_((64, 3, 7, 7))
    for leaf, shp in (("weight", 64), ("bias", 64), ("running_mean", 64),
                      ("running_var", 64)):
        sd[f"backbone.0.body.bn1.{leaf}"] = t_((shp,), positive=leaf == "running_var")
    widths = {1: 64, 2: 128, 3: 256, 4: 512}
    in_ch = {1: 64, 2: 256, 3: 512, 4: 1024}
    for l, w_ in widths.items():
        pre = f"backbone.0.body.layer{l}.0"
        sd[f"{pre}.conv1.weight"] = t_((w_, in_ch[l], 1, 1))
        sd[f"{pre}.conv2.weight"] = t_((w_, w_, 3, 3))
        sd[f"{pre}.conv3.weight"] = t_((w_ * 4, w_, 1, 1))
        sd[f"{pre}.downsample.0.weight"] = t_((w_ * 4, in_ch[l], 1, 1))
        for bn, ch in (("bn1", w_), ("bn2", w_), ("bn3", w_ * 4)):
            for leaf in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{pre}.{bn}.{leaf}"] = t_((ch,), positive=leaf == "running_var")
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{pre}.downsample.1.{leaf}"] = t_((w_ * 4,), positive=leaf == "running_var")
    sd["input_proj.weight"] = t_((d, 2048, 1, 1))
    sd["input_proj.bias"] = t_((d,))
    sd["query_embed.weight"] = t_((4, d))
    sd["class_embed.weight"] = t_((21, d))
    sd["class_embed.bias"] = t_((21,))
    for i in range(3):
        o = 4 if i == 2 else d
        sd[f"bbox_embed.layers.{i}.weight"] = t_((o, d))
        sd[f"bbox_embed.layers.{i}.bias"] = t_((o,))
    for side in ("encoder", "decoder"):
        pre = f"transformer.{side}.layers.0"
        sd[f"{pre}.self_attn.in_proj_weight"] = t_((3 * d, d))
        sd[f"{pre}.self_attn.in_proj_bias"] = t_((3 * d,))
        sd[f"{pre}.self_attn.out_proj.weight"] = t_((d, d))
        sd[f"{pre}.self_attn.out_proj.bias"] = t_((d,))
        sd[f"{pre}.linear1.weight"] = t_((32, d))
        sd[f"{pre}.linear1.bias"] = t_((32,))
        sd[f"{pre}.linear2.weight"] = t_((d, 32))
        sd[f"{pre}.linear2.bias"] = t_((d,))
        n_norm = 2 if side == "encoder" else 3
        for n in range(1, n_norm + 1):
            sd[f"{pre}.norm{n}.weight"] = t_((d,))
            sd[f"{pre}.norm{n}.bias"] = t_((d,))
    sd["transformer.decoder.layers.0.multihead_attn.in_proj_weight"] = t_((3 * d, d))
    sd["transformer.decoder.layers.0.multihead_attn.in_proj_bias"] = t_((3 * d,))
    sd["transformer.decoder.layers.0.multihead_attn.out_proj.weight"] = t_((d, d))
    sd["transformer.decoder.layers.0.multihead_attn.out_proj.bias"] = t_((d,))
    sd["transformer.decoder.norm.weight"] = t_((d,))
    sd["transformer.decoder.norm.bias"] = t_((d,))

    new_vars, report = import_state_dict(sd, variables, nheads=2)
    assert not report["unmapped"], report["unmapped"]
    # every write landed
    assert report["applied"] >= 80
    # strict mode must be usable despite dual-layout writes (MHA wrapper vs
    # bare self_attn): alternative groups require ONE layout to resolve,
    # not both (advisor round-2 low finding)
    strict_vars, strict_report = import_state_dict(
        sd, variables, nheads=2, strict=True
    )
    assert strict_report["applied"] == report["applied"]
    # imported params produce a valid forward
    out = model.apply(new_vars, b, t)
    assert bool(jnp.isfinite(out["pred_logits"]).all())
    # spot-check one tensor made it through with the right transform
    got = np.asarray(new_vars["params"]["backbone"]["trunk"]["conv1"]["kernel"])
    np.testing.assert_allclose(
        got, sd["backbone.0.body.conv1.weight"].transpose(2, 3, 1, 0)
    )
