"""Pallas TPU kernel: bilinear sampling as an on-the-fly one-hot matmul.

Profiling the flagship (scripts/profile_full_trace.py) shows XLA's gather
costs ~11 ns per gathered slice regardless of table size — the per-level
gather fusions are 70% of the frame. For levels with few cells the same
sampling is FLOP-cheap as a matmul: build the [samples, cells] bilinear
weight tile in VMEM (4 iota comparisons — no gather primitive, which
Mosaic lacks) and hit the MXU with it. The weight tile never touches HBM.

Math: out[q] = Σ_p aw[q,p] · Σ_corners w_c(q,p) · value[cell_c(q,p)]
            = (W @ V) reduced over P, where W[r, c] packs bilinear ×
              attention weights and is nonzero at ≤4 cells per row.

Used by `ms_deform_attn_hybrid` for levels with HW ≤ matmul_max_cells;
bigger levels keep the XLA patch gather. Backward: custom VJP that
recomputes through the (exact-equal) XLA formulation.

STATUS (measured on v5e, scripts/bench_hybrid.py): correct (matches the
torch-oracle formulations to bf16 tolerance) but ~15% SLOWER than the pure
XLA patch gather at encoder scale — the one-hot weight-tile construction
is O(samples × cells) on the VPU, the same asymptotics as the matmul but
on the slower unit. Conclusion: v5e exposes no fast random-access
primitive to Pallas (dynamic_gather is single-vreg only), so XLA's native
gather (~11 ns/sample) is the practical floor; kept in-tree as a
validated experiment and a base for sparser weight-tile schemes.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .msda import level_start_index, ms_deform_attn_patch


def _level_kernel(h, w, tq, tk, p, d):
    hw = h * w

    def kernel(x_ref, y_ref, aw_ref, v_ref, o_ref):
        kk = pl.program_id(2)
        k0 = kk * tk

        x = x_ref[0]  # [TQP, 1] pixel coords
        y = y_ref[0]
        aw = aw_ref[0]
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0

        cells = (
            jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], tk), 1) + k0
        )
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        wt = jnp.zeros((x.shape[0], tk), jnp.float32)
        for dy in (0, 1):
            for dx in (0, 1):
                xi = x0i + dx
                yi = y0i + dy
                wc = (
                    (1.0 - jnp.abs(fx - dx))
                    * (1.0 - jnp.abs(fy - dy))
                    * aw
                )
                inside = (
                    (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
                )
                cell = jnp.where(inside, yi * w + xi, -1)
                wt = wt + jnp.where(cells == cell, wc, 0.0)

        contrib = jnp.dot(
            wt.astype(v_ref.dtype), v_ref[0],
            preferred_element_type=jnp.float32,
        )  # [TQP, D]
        red = contrib.reshape(tq, p, d).sum(axis=1)  # [TQ, D]

        @pl.when(kk == 0)
        def _():
            o_ref[0] = jnp.zeros_like(o_ref[0])

        o_ref[0] += red

    return kernel


def level_sample_matmul(
    value_l: jnp.ndarray,  # [G, HW, D]
    x: jnp.ndarray,  # [G, R] pixel x (already · W - 0.5)
    y: jnp.ndarray,  # [G, R] pixel y
    aw: jnp.ndarray,  # [G, R] attention weights
    h: int,
    w: int,
    p: int,
    tq: int = 128,
    tk: int = 512,
) -> jnp.ndarray:
    """Returns [G, Lq, D] (R = Lq*P, P-adjacent layout)."""
    g, hw, d = value_l.shape
    r = x.shape[1]
    lq = r // p
    tqp = tq * p
    # pad R to a multiple of TQP and HW to a multiple of TK
    r_pad = -r % tqp
    hw_pad = -hw % tk
    if r_pad:
        x = jnp.pad(x, ((0, 0), (0, r_pad)), constant_values=-10.0)
        y = jnp.pad(y, ((0, 0), (0, r_pad)), constant_values=-10.0)
        aw = jnp.pad(aw, ((0, 0), (0, r_pad)))
    if hw_pad:
        value_l = jnp.pad(value_l, ((0, 0), (0, hw_pad), (0, 0)))
    n_q = (r + r_pad) // tqp
    n_k = (hw + hw_pad) // tk

    # sample arrays as [G, R, 1] columns: blocks (1, TQP, 1) satisfy the
    # Mosaic (8, 128)-divisible-or-full rule and land in the kernel as the
    # [TQP, 1] column vectors the weight-tile broadcast needs
    x3 = x[..., None]
    y3 = y[..., None]
    aw3 = aw[..., None]

    out = pl.pallas_call(
        _level_kernel(h, w, tq, tk, p, d),
        grid=(g, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, tqp, 1), lambda gi, qi, ki: (gi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tqp, 1), lambda gi, qi, ki: (gi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tqp, 1), lambda gi, qi, ki: (gi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda gi, qi, ki: (gi, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tq, d), lambda gi, qi, ki: (gi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(((g, (r + r_pad) // p, d)), jnp.float32),
    )(x3, y3, aw3, value_l)
    return out[:, :lq]


def _hybrid_fwd_impl(
    value, spatial_shapes, sampling_locations, attention_weights,
    matmul_max_cells,
):
    b, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    starts = level_start_index(spatial_shapes)
    g = b * m
    value_t = value.transpose(0, 2, 1, 3).reshape(g, s, d)
    # [G, Lq, L, P]
    loc_t = sampling_locations.transpose(0, 2, 1, 3, 4, 5).reshape(
        g, lq, l, p, 2
    )
    aw_t = attention_weights.transpose(0, 2, 1, 3, 4).reshape(g, lq, l, p)

    out = jnp.zeros((g, lq, d), jnp.float32)
    gather_levels = [
        i for i, (h, w) in enumerate(spatial_shapes)
        if h * w > matmul_max_cells
    ]
    matmul_levels = [
        i for i, (h, w) in enumerate(spatial_shapes)
        if h * w <= matmul_max_cells
    ]
    for lvl in matmul_levels:
        h, w = spatial_shapes[lvl]
        v_l = jax.lax.dynamic_slice_in_dim(value_t, starts[lvl], h * w, 1)
        x = (loc_t[:, :, lvl, :, 0] * w - 0.5).reshape(g, lq * p)
        y = (loc_t[:, :, lvl, :, 1] * h - 0.5).reshape(g, lq * p)
        aw_l = aw_t[:, :, lvl].reshape(g, lq * p)
        out = out + level_sample_matmul(v_l, x, y, aw_l, h, w, p)
    if gather_levels:
        # fall back to the XLA patch gather for the big levels only
        shapes_big = tuple(spatial_shapes[i] for i in gather_levels)
        vsel = jnp.concatenate(
            [
                value[:, starts[i] : starts[i] + sh[0] * sh[1]]
                for i, sh in zip(gather_levels, shapes_big)
            ],
            axis=1,
        )
        loc_big = sampling_locations[:, :, :, jnp.asarray(gather_levels)]
        aw_big = attention_weights[:, :, :, jnp.asarray(gather_levels)]
        out_big = ms_deform_attn_patch(vsel, shapes_big, loc_big, aw_big)
        out = out + out_big.reshape(b, lq, m, d).transpose(0, 2, 1, 3).reshape(
            g, lq, d
        )
    return out.reshape(b, m, lq, d).transpose(0, 2, 1, 3).reshape(b, lq, m * d)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(1, 4)
)
def ms_deform_attn_hybrid(
    value,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations,
    attention_weights,
    matmul_max_cells: int = 6144,
):
    return _hybrid_fwd_impl(
        value, tuple(spatial_shapes), sampling_locations, attention_weights,
        matmul_max_cells,
    )


def _hybrid_fwd(value, spatial_shapes, loc, aw, matmul_max_cells):
    out = _hybrid_fwd_impl(value, tuple(spatial_shapes), loc, aw,
                           matmul_max_cells)
    return out, (value, loc, aw)


def _hybrid_bwd(spatial_shapes, matmul_max_cells, res, g):
    value, loc, aw = res
    # backward through the (numerically identical) XLA formulation
    _, vjp = jax.vjp(
        lambda v, l_, a: ms_deform_attn_patch(v, tuple(spatial_shapes), l_, a),
        value, loc, aw,
    )
    return vjp(g)


ms_deform_attn_hybrid.defvjp(_hybrid_fwd, _hybrid_bwd)
