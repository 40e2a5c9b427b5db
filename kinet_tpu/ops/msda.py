"""Multi-scale deformable attention sampling core.

Semantic spec: reference ops/functions/ms_deform_attn_func.py:34-54
(`ms_deform_attn_core_pytorch`) — per level, bilinear `grid_sample`
(align_corners=False, zero padding) of the value map at the sampling
locations, weighted by attention and summed over (levels × points).
The CUDA kernels (ops/src/cuda/ms_deform_im2col_cuda.cuh) implement the
same math; on TPU we provide:

Implementations (all exact, validated against a torch grid_sample oracle
incl. gradients in tests/test_msda.py ≙ reference ops/test.py; XLA autodiff
provides the col2im/col2im_coord backward as scatter-adds, so no custom VJP
is needed):
- `ms_deform_attn_patch` — the production path: ONE [2, 2, D] slice gather
  per (sample, level) fetches all four bilinear corners,
- `ms_deform_attn` — row-pair variant (two [2, D] row gathers per sample),
- `ms_deform_attn_scan` — per-(level, point) lax.scan, minimal memory,
- `ms_deform_attn_loop` — readability oracle.
A Pallas VMEM-table kernel is NOT expressible on this toolchain:
tpu.dynamic_gather only shuffles within one vreg (see PLAN.md).

Shapes (all static):
  value:             [B, S, M, D]   S = sum_l H_l*W_l
  spatial_shapes:    static tuple ((H0, W0), ...)
  sampling_locations:[B, Lq, M, L, P, 2]  (x, y) in [0, 1]
  attention_weights: [B, Lq, M, L, P]
  returns:           [B, Lq, M * D]
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def level_start_index(spatial_shapes) -> Tuple[int, ...]:
    starts, cur = [], 0
    for h, w in spatial_shapes:
        starts.append(cur)
        cur += h * w
    return tuple(starts)


@functools.partial(jax.jit, static_argnames=("spatial_shapes",))
def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Row-pair slice-gather formulation (the fast path).

    Key observation: the two x-corners of a bilinear sample are ADJACENT in
    the row-major level layout, so each (y-row, sample) needs ONE gather of
    a [2, D] contiguous slice — 2 gathers per sample total (y0/y1 rows)
    instead of 4 scalar-row gathers, with 2x the DMA granularity. A guard
    row is prepended/appended to the flattened value so edge samples never
    index out of range (their bilinear weight is already 0).

    Measured on v5e at encoder scale (S=Lq=24k, L=4, M=8, P=4): ~15 ms for
    the per-(level,point) lax.scan variant vs ~roofline for this one; see
    scripts/profile_components.py.
    """
    b, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    assert l == len(spatial_shapes)
    starts = jnp.asarray(level_start_index(spatial_shapes), jnp.int32)
    h_arr = jnp.asarray([sh[0] for sh in spatial_shapes], jnp.float32)
    w_arr = jnp.asarray([sh[1] for sh in spatial_shapes], jnp.float32)
    w_int = jnp.asarray([sh[1] for sh in spatial_shapes], jnp.int32)
    compute_dtype = value.dtype

    # [B, M, Lq, L, P] layout for everything per-sample
    loc_t = sampling_locations.transpose(0, 2, 1, 3, 4, 5)
    aw_t = attention_weights.transpose(0, 2, 1, 3, 4)

    x = loc_t[..., 0] * w_arr[None, None, None, :, None] - 0.5
    y = loc_t[..., 1] * h_arr[None, None, None, :, None] - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0  # weight of the x1 corner
    fy = y - y0

    w_edge = w_arr[None, None, None, :, None]
    h_edge = h_arr[None, None, None, :, None]
    in_x0 = (x0 >= 0) & (x0 <= w_edge - 1)
    in_x1 = (x0 + 1 >= 0) & (x0 + 1 <= w_edge - 1)
    in_y0 = (y0 >= 0) & (y0 <= h_edge - 1)
    in_y1 = (y0 + 1 >= 0) & (y0 + 1 <= h_edge - 1)

    # corner weights folded with the attention weight
    wx0 = (1 - fx) * in_x0
    wx1 = fx * in_x1
    wy0 = ((1 - fy) * in_y0) * aw_t
    wy1 = (fy * in_y1) * aw_t

    # row starts; x0 clipped to [-1, W-1] keeps the +1 element correct even
    # when the x0 corner is (weight-0) out of range
    x0c = jnp.clip(x0.astype(jnp.int32), -1, w_int[None, None, None, :, None] - 1)
    h_int = jnp.asarray([sh[0] for sh in spatial_shapes], jnp.int32)
    y0c = jnp.clip(y0.astype(jnp.int32), 0, h_int[None, None, None, :, None] - 1)
    y1c = jnp.clip(
        y0.astype(jnp.int32) + 1, 0, h_int[None, None, None, :, None] - 1
    )
    base = starts[None, None, None, :, None]
    wr = w_int[None, None, None, :, None]
    idx_y0 = base + y0c * wr + x0c + 1  # +1 for the guard row
    idx_y1 = base + y1c * wr + x0c + 1

    # guarded flat value: [B, M, S+2, D]
    value_t = value.transpose(0, 2, 1, 3)
    value_g = jnp.pad(value_t, ((0, 0), (0, 0), (1, 1), (0, 0)))

    r = lq * l * p
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2),
        collapsed_slice_dims=(),
        start_index_map=(0,),
    )

    def gather_rows(vg, idx):
        # vg [S+2, D], idx [R] -> [R, 2, D]
        return jax.lax.gather(
            vg,
            idx[:, None],
            dnums,
            slice_sizes=(2, d),
            mode="clip",
        )

    gather_bm = jax.vmap(jax.vmap(gather_rows))

    idx_y0f = idx_y0.reshape(b, m, r)
    idx_y1f = idx_y1.reshape(b, m, r)
    g0 = gather_bm(value_g, idx_y0f)  # [B, M, R, 2, D]
    g1 = gather_bm(value_g, idx_y1f)

    wx = jnp.stack([wx0, wx1], axis=-1).reshape(b, m, r, 2)
    row0 = jnp.einsum(
        "bmrc,bmrcd->bmrd", wx.astype(compute_dtype), g0
    ) * wy0.reshape(b, m, r, 1).astype(compute_dtype)
    row1 = jnp.einsum(
        "bmrc,bmrcd->bmrd", wx.astype(compute_dtype), g1
    ) * wy1.reshape(b, m, r, 1).astype(compute_dtype)
    out = (row0 + row1).reshape(b, m, lq, l * p, d).sum(axis=3)
    return out.transpose(0, 2, 1, 3).reshape(b, lq, m * d).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("spatial_shapes",))
def ms_deform_attn_scan(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Scan formulation: one (level, point) pair per scan step. The naive
    fully-vectorized form materializes [B, Lq, M, L, P, D] intermediates —
    ~14 GB at encoder scale — and unrolls 4·L·P gathers into one giant HLO
    (minutes of XLA compile). The scan body touches only [B, M, Lq, D]
    tensors (tens of MB), so runtime is gather-bandwidth-bound and compile
    is fast; autodiff of the scan yields the scatter-add backward
    (≙ CUDA col2im, reference ms_deform_im2col_cuda.cuh:240-378)."""
    b, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    assert l == len(spatial_shapes)
    starts = jnp.asarray(level_start_index(spatial_shapes), jnp.int32)
    h_arr = jnp.asarray([sh[0] for sh in spatial_shapes], jnp.int32)
    w_arr = jnp.asarray([sh[1] for sh in spatial_shapes], jnp.int32)

    value_t = value.transpose(0, 2, 1, 3)  # [B, M, S, D]
    compute_dtype = value.dtype

    # [L*P, B, M, Lq, ...] scan layout
    loc_s = sampling_locations.transpose(3, 4, 0, 2, 1, 5).reshape(
        l * p, b, m, lq, 2
    )
    aw_s = attention_weights.transpose(3, 4, 0, 2, 1).reshape(l * p, b, m, lq)
    lvl_ids = jnp.repeat(jnp.arange(l, dtype=jnp.int32), p)

    def step(acc, inp):
        loc_i, aw_i, lvl = inp
        hf = h_arr[lvl].astype(jnp.float32)
        wf = w_arr[lvl].astype(jnp.float32)
        wi = w_arr[lvl]
        hi = h_arr[lvl]
        st = starts[lvl]
        # grid_sample(align_corners=False): pixel = loc * size - 0.5
        x = loc_i[..., 0] * wf - 0.5
        y = loc_i[..., 1] * hf - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        sample = jnp.zeros((b, m, lq, d), compute_dtype)
        for dy in (0, 1):
            for dx in (0, 1):
                xi = x0 + dx
                yi = y0 + dy
                w_bilin = (1.0 - jnp.abs(x - xi)) * (1.0 - jnp.abs(y - yi))
                inside = (
                    (xi >= 0) & (xi <= wf - 1) & (yi >= 0) & (yi <= hf - 1)
                )
                xi_c = jnp.clip(xi.astype(jnp.int32), 0, wi - 1)
                yi_c = jnp.clip(yi.astype(jnp.int32), 0, hi - 1)
                idx = st + yi_c * wi + xi_c  # [B, M, Lq]
                g = jnp.take_along_axis(
                    value_t, idx[..., None], axis=2
                )  # [B, M, Lq, D]
                wgt = (w_bilin * inside.astype(jnp.float32)).astype(
                    compute_dtype
                )
                sample = sample + wgt[..., None] * g
        return acc + aw_i.astype(compute_dtype)[..., None] * sample, None

    acc0 = jnp.zeros((b, m, lq, d), compute_dtype)
    acc, _ = jax.lax.scan(step, acc0, (loc_s, aw_s, lvl_ids))
    return acc.transpose(0, 2, 1, 3).reshape(b, lq, m * d).astype(jnp.float32)


def ms_deform_attn_loop(
    value, spatial_shapes, sampling_locations, attention_weights
):
    """Straightforward per-level loop variant (readability oracle; identical
    math to `ms_deform_attn`, used in tests)."""
    b, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    out = jnp.zeros((b, lq, m, d), jnp.float32)
    start = 0
    for lid, (h, w) in enumerate(spatial_shapes):
        v = value[:, start : start + h * w]  # [B, HW, M, D]
        start += h * w
        loc = sampling_locations[:, :, :, lid]  # [B, Lq, M, P, 2]
        aw = attention_weights[:, :, :, lid]  # [B, Lq, M, P]
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0, y0 = jnp.floor(x), jnp.floor(y)
        for dy in (0, 1):
            for dx in (0, 1):
                xi, yi = x0 + dx, y0 + dy
                wt = (1 - jnp.abs(x - xi)) * (1 - jnp.abs(y - yi))
                inside = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
                idx = (
                    jnp.clip(yi.astype(jnp.int32), 0, h - 1) * w
                    + jnp.clip(xi.astype(jnp.int32), 0, w - 1)
                )
                v_t = v.transpose(0, 2, 1, 3)  # [B, M, HW, D]
                idx_g = idx.transpose(0, 2, 1, 3).reshape(b, m, lq * p)
                g = jnp.take_along_axis(v_t, idx_g[..., None], axis=2)
                g = g.reshape(b, m, lq, p, d).transpose(0, 2, 1, 3, 4)
                out = out + jnp.sum(
                    (wt * inside * aw)[..., None] * g, axis=3
                )
    return out.reshape(b, lq, m * d)


@functools.partial(jax.jit, static_argnames=("spatial_shapes",))
def ms_deform_attn_patch(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """2x2-patch gather variant: ONE lax.gather slice of [2, 2, D] per
    (sample, level) fetches all four bilinear corners — half the gather
    rows of the row-pair formulation (XLA TPU gather cost is per-row).

    Boundaries: instead of guard-padding the value (a full copy per layer —
    ~42 ms/frame in the flagship profile), the window start is clamped to
    [0, H-2]x[0, W-2] and the per-corner weights are REMAPPED to window
    slots by the clamp shift: shift = clamp(c0) - c0 ∈ {-1, 0, +1};
    slot0 gets w0 when shift==0, w1 when shift==+1; slot1 gets w1 when
    shift==0, w0 when shift==-1 (out-of-range corners already weigh 0).
    Exactness vs the grid_sample oracle is covered by tests/test_msda.py.
    """
    b, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    starts = level_start_index(spatial_shapes)
    compute_dtype = value.dtype
    value_t = value.transpose(0, 2, 1, 3)  # [B, M, S, D]

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    def gather_patches(vg, idx):
        # vg [H, W, D], idx [R, 2] -> [R, 2, 2, D]
        return jax.lax.gather(
            vg, idx, dnums, slice_sizes=(2, 2, d), mode="clip"
        )

    gather_bm = jax.vmap(jax.vmap(gather_patches))

    def slot_weights(c0, f, size, size_padded):
        """Window-slot weights for one axis. c0=floor coord, f=frac.
        Bounds use the TRUE size; the clamp uses the (possibly padded)
        buffer size so a [2]-slice always fits."""
        w0 = (1 - f) * ((c0 >= 0) & (c0 <= size - 1))
        w1 = f * ((c0 + 1 >= 0) & (c0 + 1 <= size - 1))
        c0i = c0.astype(jnp.int32)
        c0c = jnp.clip(c0i, 0, size_padded - 2)
        shift = c0c - c0i  # {-1, 0, +1}
        s0 = jnp.where(shift == 0, w0, jnp.where(shift == 1, w1, 0.0))
        s1 = jnp.where(shift == 0, w1, jnp.where(shift == -1, w0, 0.0))
        return jnp.stack([s0, s1], -1), c0c

    out = jnp.zeros((b, m, lq, d), compute_dtype)
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value_t[:, :, starts[lvl] : starts[lvl] + h * w].reshape(
            b, m, h, w, d
        )
        # degenerate levels (H or W == 1, tiny inputs) can't fit a 2-slice:
        # zero-pad bottom/right minimally (weights beyond the true size
        # are already 0)
        hp, wp = max(h, 2), max(w, 2)
        if (hp, wp) != (h, w):
            v = jnp.pad(v, ((0, 0), (0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        loc = sampling_locations[:, :, :, lvl].transpose(0, 2, 1, 3, 4)
        aw = attention_weights[:, :, :, lvl].transpose(0, 2, 1, 3)
        x = loc[..., 0] * w - 0.5  # [B, M, Lq, P]
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx, x0c = slot_weights(x0, x - x0, w, wp)  # [B,M,Lq,P,2]
        wy, y0c = slot_weights(y0, y - y0, h, hp)
        w22 = (wy[..., :, None] * wx[..., None, :]) * aw[..., None, None]
        idx = jnp.stack([y0c, x0c], -1).reshape(b, m, lq * p, 2)
        g = gather_bm(v, idx).reshape(b, m, lq, p, 2, 2, d)
        contrib = jnp.einsum(
            "bmqpyx,bmqpyxd->bmqd",
            w22.astype(compute_dtype),
            g,
        )
        out = out + contrib
    return out.transpose(0, 2, 1, 3).reshape(b, lq, m * d).astype(jnp.float32)
