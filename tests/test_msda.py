"""MSDA op equivalence tests (mirrors reference ops/test.py:23-146):
XLA implementation vs torch.nn.functional.grid_sample oracle, plus
gradient checks via finite differences on the torch side."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from kinet_tpu.ops.msda import ms_deform_attn, ms_deform_attn_loop


def torch_core(value, spatial_shapes, sampling_locations, attention_weights):
    """Literal grid_sample formulation (semantic spec,
    reference ms_deform_attn_func.py:34-54), in torch on CPU."""
    N, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    value_list = value.split([h * w for h, w in spatial_shapes], dim=1)
    sampling_grids = 2 * sampling_locations - 1
    out = []
    for lid, (H, W) in enumerate(spatial_shapes):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(N * M, D, H, W)
        g = sampling_grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        sampled = F.grid_sample(
            v, g, mode="bilinear", padding_mode="zeros", align_corners=False
        )  # [N*M, D, Lq, P]
        out.append(sampled)
    aw = attention_weights.transpose(1, 2).reshape(N * M, 1, Lq, L * P)
    o = (torch.stack(out, dim=-2).flatten(-2) * aw).sum(-1)
    return o.view(N, M * D, Lq).transpose(1, 2).contiguous()


def _random_inputs(seed, b=2, m=4, d=8, lq=10, p=3, shapes=((6, 8), (3, 4))):
    rng = np.random.default_rng(seed)
    s = sum(h * w for h, w in shapes)
    l = len(shapes)
    value = rng.normal(size=(b, s, m, d)).astype(np.float32)
    loc = rng.uniform(-0.1, 1.1, size=(b, lq, m, l, p, 2)).astype(np.float32)
    aw = rng.uniform(size=(b, lq, m, l, p)).astype(np.float32)
    aw = aw / aw.sum(axis=(3, 4), keepdims=True)
    return value, loc, aw, shapes


@pytest.mark.parametrize("seed", [0, 1])
def test_xla_matches_grid_sample(seed):
    value, loc, aw, shapes = _random_inputs(seed)
    ours = np.asarray(ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(aw)))
    ref = torch_core(
        torch.from_numpy(value), shapes, torch.from_numpy(loc), torch.from_numpy(aw)
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_loop_variant_matches():
    value, loc, aw, shapes = _random_inputs(3)
    a = np.asarray(ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(aw)))
    b = np.asarray(ms_deform_attn_loop(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(aw)))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_gradients_match_torch_autograd():
    value, loc, aw, shapes = _random_inputs(7, b=1, m=2, d=4, lq=5, p=2)

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(loc).requires_grad_(True)
    ta = torch.from_numpy(aw).requires_grad_(True)
    torch_out = torch_core(tv, shapes, tl, ta)
    torch_out.sum().backward()

    def f(v, l_, a_):
        return jnp.sum(ms_deform_attn(v, shapes, l_, a_))

    gv, gl, ga = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(aw)
    )
    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), rtol=1e-4, atol=1e-5)
    # location grads: grid_sample's border behavior differs exactly at
    # integer pixel boundaries; compare where the sampling point is interior
    x = loc[..., 0] * np.array([w for _, w in shapes])[None, None, None, :, None] - 0.5
    y = loc[..., 1] * np.array([h for h, _ in shapes])[None, None, None, :, None] - 0.5
    interior = (np.abs(x - np.round(x)) > 1e-3) & (np.abs(y - np.round(y)) > 1e-3)
    mask = np.repeat(interior[..., None], 2, axis=-1)
    np.testing.assert_allclose(
        np.asarray(gl)[mask], tl.grad.numpy()[mask], rtol=1e-3, atol=1e-4
    )


def test_pallas_hybrid_matches_oracle_interpret():
    """Pallas one-hot-matmul MSDA (interpret mode) vs the loop oracle,
    incl. the custom-VJP gradient path."""
    from unittest import mock

    import jax.experimental.pallas as pl_mod

    from kinet_tpu.ops import pallas_msda

    orig = pl_mod.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    value, loc, aw, shapes = _random_inputs(5, b=2, m=4, d=8, lq=16, p=4)
    ref = np.asarray(
        ms_deform_attn_loop(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(aw))
    )
    with mock.patch("kinet_tpu.ops.pallas_msda.pl.pallas_call", interp):
        out = np.asarray(
            pallas_msda.ms_deform_attn_hybrid(
                jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(aw), 1000
            )
        )
        gv = jax.grad(
            lambda v: jnp.sum(
                pallas_msda.ms_deform_attn_hybrid(v, shapes, jnp.asarray(loc), jnp.asarray(aw), 1000)
            )
        )(jnp.asarray(value))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    gref = jax.grad(
        lambda v: jnp.sum(ms_deform_attn_loop(v, shapes, jnp.asarray(loc), jnp.asarray(aw)))
    )(jnp.asarray(value))
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gref), rtol=1e-4, atol=1e-5)


def test_topk_matches_masked_full():
    """ms_deform_attn_topk == full attention with non-top-k weights zeroed
    (DEFA-style pruning oracle)."""
    from kinet_tpu.ops.msda import ms_deform_attn_topk

    value, loc, aw, shapes = _random_inputs(5)
    l = len(shapes)
    p = aw.shape[-1]
    for k in (2, 3, l * p):
        ours = np.asarray(
            ms_deform_attn_topk(
                jnp.asarray(value), shapes, jnp.asarray(loc),
                jnp.asarray(aw), top_k=k,
            )
        )
        aw_f = aw.reshape(*aw.shape[:3], l * p)
        kth = np.sort(aw_f, axis=-1)[..., -k][..., None]
        aw_masked = np.where(aw_f >= kth, aw_f, 0.0).reshape(aw.shape)
        ref = np.asarray(
            ms_deform_attn(
                jnp.asarray(value), shapes, jnp.asarray(loc),
                jnp.asarray(aw_masked),
            )
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_topk_degenerate_levels():
    from kinet_tpu.ops.msda import ms_deform_attn_topk

    value, loc, aw, shapes = _random_inputs(6, shapes=((5, 7), (1, 1)))
    full = np.asarray(
        ms_deform_attn_topk(
            jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(aw),
            top_k=aw.shape[-1] * len(shapes),
        )
    )
    ref = np.asarray(
        ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(aw))
    )
    np.testing.assert_allclose(full, ref, rtol=1e-4, atol=1e-5)


def test_shared_locs_matches_broadcast():
    """Head-shared sampling == per-head sampling with identical locations
    broadcast over heads."""
    from kinet_tpu.ops.msda import ms_deform_attn_patch_shared

    value, loc, aw, shapes = _random_inputs(7)
    b, lq, m, l, p, _ = loc.shape
    loc_shared = loc[:, :, 0]  # [B, Lq, L, P, 2]
    ours = np.asarray(
        ms_deform_attn_patch_shared(
            jnp.asarray(value), shapes, jnp.asarray(loc_shared), jnp.asarray(aw)
        )
    )
    loc_bcast = np.broadcast_to(loc_shared[:, :, None], loc.shape).copy()
    ref = np.asarray(
        ms_deform_attn(
            jnp.asarray(value), shapes, jnp.asarray(loc_bcast), jnp.asarray(aw)
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_shared_locs_degenerate_levels():
    from kinet_tpu.ops.msda import ms_deform_attn_patch_shared

    value, loc, aw, shapes = _random_inputs(8, shapes=((5, 7), (1, 1)))
    loc_shared = loc[:, :, 0]
    ours = np.asarray(
        ms_deform_attn_patch_shared(
            jnp.asarray(value), shapes, jnp.asarray(loc_shared), jnp.asarray(aw)
        )
    )
    loc_bcast = np.broadcast_to(loc_shared[:, :, None], loc.shape).copy()
    ref = np.asarray(
        ms_deform_attn(
            jnp.asarray(value), shapes, jnp.asarray(loc_bcast), jnp.asarray(aw)
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_quad_matches_grid_sample():
    """Quad-table flat-row formulation (the fast exact path) vs the torch
    grid_sample oracle."""
    from kinet_tpu.ops.msda import ms_deform_attn_quad

    for seed, shapes in ((9, ((6, 8), (3, 4))), (10, ((5, 7), (1, 1)))):
        value, loc, aw, shapes = _random_inputs(seed, shapes=shapes)
        ours = np.asarray(
            ms_deform_attn_quad(
                jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(aw)
            )
        )
        ref = torch_core(
            torch.from_numpy(value), shapes, torch.from_numpy(loc),
            torch.from_numpy(aw),
        ).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_quad_shared_matches_broadcast():
    from kinet_tpu.ops.msda import ms_deform_attn_quad_shared

    for seed, shapes in ((11, ((6, 8), (3, 4))), (12, ((5, 7), (1, 1)))):
        value, loc, aw, shapes = _random_inputs(seed, shapes=shapes)
        loc_shared = loc[:, :, 0]
        ours = np.asarray(
            ms_deform_attn_quad_shared(
                jnp.asarray(value), shapes, jnp.asarray(loc_shared),
                jnp.asarray(aw),
            )
        )
        loc_bcast = np.broadcast_to(loc_shared[:, :, None], loc.shape).copy()
        ref = torch_core(
            torch.from_numpy(value), shapes, torch.from_numpy(loc_bcast),
            torch.from_numpy(aw),
        ).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_quad_gradients_match_patch():
    """Same gradients as the patch formulation (both exact)."""
    from kinet_tpu.ops.msda import ms_deform_attn_patch, ms_deform_attn_quad

    value, loc, aw, shapes = _random_inputs(13)

    def loss(fn, v, l_, a):
        return jnp.sum(fn(jnp.asarray(v), shapes, l_, a) ** 2)

    gv1, gl1, ga1 = jax.grad(
        lambda v, l_, a: loss(ms_deform_attn_patch, v, l_, a), argnums=(0, 1, 2)
    )(jnp.asarray(value), jnp.asarray(loc), jnp.asarray(aw))
    gv2, gl2, ga2 = jax.grad(
        lambda v, l_, a: loss(ms_deform_attn_quad, v, l_, a), argnums=(0, 1, 2)
    )(jnp.asarray(value), jnp.asarray(loc), jnp.asarray(aw))
    np.testing.assert_allclose(np.asarray(gv1), np.asarray(gv2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gl1), np.asarray(gl2), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga1), np.asarray(ga2), rtol=1e-4, atol=1e-5)


def test_quad_fold_matches_grid_sample():
    from kinet_tpu.ops.msda import (
        ms_deform_attn_quad_fold,
        ms_deform_attn_quad_shared_fold,
    )

    for seed, shapes in ((14, ((6, 8), (3, 4))), (15, ((5, 7), (1, 1)))):
        value, loc, aw, shapes = _random_inputs(seed, shapes=shapes)
        ours = np.asarray(
            ms_deform_attn_quad_fold(
                jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(aw)
            )
        )
        ref = torch_core(
            torch.from_numpy(value), shapes, torch.from_numpy(loc),
            torch.from_numpy(aw),
        ).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

        loc_shared = loc[:, :, 0]
        ours_sh = np.asarray(
            ms_deform_attn_quad_shared_fold(
                jnp.asarray(value), shapes, jnp.asarray(loc_shared),
                jnp.asarray(aw),
            )
        )
        loc_bcast = np.broadcast_to(loc_shared[:, :, None], loc.shape).copy()
        ref_sh = torch_core(
            torch.from_numpy(value), shapes, torch.from_numpy(loc_bcast),
            torch.from_numpy(aw),
        ).numpy()
        np.testing.assert_allclose(ours_sh, ref_sh, rtol=1e-4, atol=1e-5)


def test_quad_unroll_matches_grid_sample():
    from kinet_tpu.ops.msda import ms_deform_attn_quad_unroll

    for seed, shapes in ((16, ((6, 8), (3, 4))), (17, ((5, 7), (1, 1)))):
        value, loc, aw, shapes = _random_inputs(seed, shapes=shapes)
        ours = np.asarray(
            ms_deform_attn_quad_unroll(
                jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(aw)
            )
        )
        ref = torch_core(
            torch.from_numpy(value), shapes, torch.from_numpy(loc),
            torch.from_numpy(aw),
        ).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_quad_unroll_batch_unroll_exact():
    """Per-batch-element unrolled gathers (the multi-batch fast path:
    B1-size tables stay in the fast gather tier, batch_scaling_probe.py)
    must be EXACT vs the batched formulation and the grid_sample oracle —
    identical adds per output element, fwd and grad."""
    from kinet_tpu.ops.msda import ms_deform_attn_quad_unroll

    value, loc, aw, shapes = _random_inputs(21, shapes=((6, 8), (3, 4)))
    # batch it up
    value = np.concatenate([value, value[::-1] * 0.5], axis=0)
    loc = np.concatenate([loc, loc[::-1]], axis=0)
    aw = np.concatenate([aw, aw[::-1]], axis=0)

    batched = np.asarray(
        ms_deform_attn_quad_unroll(
            jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(aw),
            batch_unroll=False,
        )
    )
    unrolled = np.asarray(
        ms_deform_attn_quad_unroll(
            jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(aw),
            batch_unroll=True,
        )
    )
    np.testing.assert_array_equal(unrolled, batched)  # bit-identical
    ref = torch_core(
        torch.from_numpy(value), shapes, torch.from_numpy(loc),
        torch.from_numpy(aw),
    ).numpy()
    np.testing.assert_allclose(unrolled, ref, rtol=1e-4, atol=1e-5)

    # gradients agree between the two formulations
    def loss_fn(unroll):
        def f(v, l_, a):
            return jnp.sum(
                ms_deform_attn_quad_unroll(
                    v, shapes, l_, a, batch_unroll=unroll
                )
                ** 2
            )
        return jax.grad(f, argnums=(0, 1, 2))(
            jnp.asarray(value), jnp.asarray(loc), jnp.asarray(aw)
        )

    g_b = loss_fn(False)
    g_u = loss_fn(True)
    for gb, gu in zip(g_b, g_u):
        np.testing.assert_allclose(
            np.asarray(gu), np.asarray(gb), rtol=1e-5, atol=1e-6
        )


def test_topk_quad_matches_masked_full():
    from kinet_tpu.ops.msda import ms_deform_attn_topk_quad

    value, loc, aw, shapes = _random_inputs(18)
    l = len(shapes)
    p = aw.shape[-1]
    for k in (2, l * p):
        ours = np.asarray(
            ms_deform_attn_topk_quad(
                jnp.asarray(value), shapes, jnp.asarray(loc),
                jnp.asarray(aw), top_k=k,
            )
        )
        aw_f = aw.reshape(*aw.shape[:3], l * p)
        kth = np.sort(aw_f, axis=-1)[..., -k][..., None]
        aw_masked = np.where(aw_f >= kth, aw_f, 0.0).reshape(aw.shape)
        ref = np.asarray(
            ms_deform_attn(
                jnp.asarray(value), shapes, jnp.asarray(loc),
                jnp.asarray(aw_masked),
            )
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_int8_value_tables_close_to_exact():
    """int8-quantized value tables (inference fast path): within
    quantization tolerance of the exact op."""
    from kinet_tpu.ops.msda import ms_deform_attn_quad_unroll

    value, loc, aw, shapes = _random_inputs(19)
    exact = np.asarray(
        ms_deform_attn_quad_unroll(
            jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(aw)
        )
    )
    absmax = np.abs(value).max(axis=(1, 3), keepdims=True)
    scale = np.maximum(absmax / 127.0, 1e-8)
    q8 = np.clip(np.round(value / scale), -127, 127).astype(np.int8)
    quant = np.asarray(
        ms_deform_attn_quad_unroll(
            jnp.asarray(q8), shapes, jnp.asarray(loc), jnp.asarray(aw),
            value_scale=jnp.asarray(scale[:, 0, :, 0], jnp.float32),
        )
    )
    err = np.abs(quant - exact).max()
    tol = 2.5 * scale.max()  # a few quantization steps after interpolation
    assert err < tol, (err, tol)
