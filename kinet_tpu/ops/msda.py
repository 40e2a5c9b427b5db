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


def _slot_weights(c0, f, size, size_padded):
    """Window-slot weights for one axis of a 2-wide bilinear window.
    c0=floor coord, f=frac, size=true extent, size_padded=buffer extent.
    Out-of-range corners weigh 0; the clamp shift remaps corner weights to
    window slots (see ms_deform_attn_patch docstring)."""
    w0 = (1 - f) * ((c0 >= 0) & (c0 <= size - 1))
    w1 = f * ((c0 + 1 >= 0) & (c0 + 1 <= size - 1))
    c0i = c0.astype(jnp.int32)
    hi = jnp.asarray(size_padded, jnp.int32) - 2
    c0c = jnp.clip(c0i, 0, hi)
    shift = c0c - c0i  # {-1, 0, +1}
    s0 = jnp.where(shift == 0, w0, jnp.where(shift == 1, w1, 0.0))
    s1 = jnp.where(shift == 0, w1, jnp.where(shift == -1, w0, 0.0))
    return jnp.stack([s0, s1], -1), c0c


def _quad_slot_weights(c0, f, size):
    """Slot weights for the quad-table formulation: the table row at clamped
    c0 holds corners (c0, c0+1) where column c0+1 is edge-duplicated, so the
    clamp range is [0, size-1] and only shifts {0, +1, -1} occur."""
    w0 = (1 - f) * ((c0 >= 0) & (c0 <= size - 1))
    w1 = f * ((c0 + 1 >= 0) & (c0 + 1 <= size - 1))
    c0i = c0.astype(jnp.int32)
    hi = jnp.asarray(size, jnp.int32) - 1
    c0c = jnp.clip(c0i, 0, hi)
    shift = c0c - c0i
    s0 = jnp.where(shift == 0, w0, jnp.where(shift == 1, w1, 0.0))
    s1 = jnp.where(shift == 0, w1, 0.0)
    return jnp.stack([s0, s1], -1), c0c


def _build_quad(v, axis_x, axis_y):
    """[..., H, W, C] -> [..., H, W, 4C]: concat (y0x0, y0x1, y1x0, y1x1)
    with edge-duplicated shifts, in ONE final concat (a staged 2D->4D
    build writes the table 1.5x; this writes it once — the operands are
    slices of v that XLA fuses into the concat)."""

    def shift_edge(a, axis):
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(1, None)
        last = [slice(None)] * a.ndim
        last[axis] = slice(-1, None)
        return jnp.concatenate([a[tuple(sl)], a[tuple(last)]], axis=axis)

    sx = shift_edge(v, axis_x)
    return jnp.concatenate(
        [v, sx, shift_edge(v, axis_y), shift_edge(sx, axis_y)], axis=-1
    )


@functools.partial(jax.jit, static_argnames=("spatial_shapes",))
def ms_deform_attn_quad(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Quad-table flat-row gather — the fast exact formulation.

    Measured on v5e (scripts/gather_bw_probe.py): XLA TPU gathers whose
    slice spans >1 row of the major dim run at ~0.2-2 GB/s, while flat
    single-row [1, C] gathers run at 30-45 GB/s. So instead of fetching a
    [2, 2, D] patch per sample, pre-interleave each cell's 2x2 bilinear
    neighborhood into ONE row of a [H*W, 4D] quad table (two dense
    edge-duplicated shifts + concats, negligible next to the gather) and
    fetch it with a single [1, 4D] row gather. Exact same math as
    ms_deform_attn_patch (oracle: tests/test_msda.py).
    """
    b, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    starts = level_start_index(spatial_shapes)
    compute_dtype = value.dtype
    value_t = value.transpose(0, 2, 1, 3)  # [B, M, S, D]

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2),
        collapsed_slice_dims=(),
        start_index_map=(0,),
    )

    def gather_rows(vq, idx):
        # vq [HW, 4D], idx [R, 1] -> [R, 1, 4D]
        return jax.lax.gather(
            vq, idx, dnums, slice_sizes=(1, 4 * d), mode="clip"
        )

    gather_bm = jax.vmap(jax.vmap(gather_rows))

    out = jnp.zeros((b, m, lq, d), compute_dtype)
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value_t[:, :, starts[lvl] : starts[lvl] + h * w].reshape(
            b, m, h, w, d
        )
        vq = _build_quad(v, axis_x=3, axis_y=2).reshape(b, m, h * w, 4 * d)
        loc = sampling_locations[:, :, :, lvl].transpose(0, 2, 1, 3, 4)
        aw = attention_weights[:, :, :, lvl].transpose(0, 2, 1, 3)
        x = loc[..., 0] * w - 0.5  # [B, M, Lq, P]
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx, x0c = _quad_slot_weights(x0, x - x0, w)  # [B,M,Lq,P,2]
        wy, y0c = _quad_slot_weights(y0, y - y0, h)
        # corner order matches the quad layout: (y0x0, y0x1, y1x0, y1x1)
        w4 = (wy[..., :, None] * wx[..., None, :]).reshape(
            b, m, lq, p, 4
        ) * aw[..., None]
        idx = (y0c * w + x0c).reshape(b, m, lq * p, 1)
        g = gather_bm(vq, idx).reshape(b, m, lq, p, 4, d)
        out = out + jnp.einsum(
            "bmqpc,bmqpcd->bmqd", w4.astype(compute_dtype), g
        )
    return out.transpose(0, 2, 1, 3).reshape(b, lq, m * d).astype(jnp.float32)


def _quad_all_levels(value_t, spatial_shapes, starts):
    """[B, M, S, D] -> [B, M, S, 4D] quad table over all levels."""
    b, m, s, d = value_t.shape
    quads = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value_t[:, :, starts[lvl] : starts[lvl] + h * w].reshape(
            b, m, h, w, d
        )
        quads.append(
            _build_quad(v, axis_x=3, axis_y=2).reshape(b, m, h * w, 4 * d)
        )
    return jnp.concatenate(quads, axis=2)


def _quad_all_levels_flat(value_g, spatial_shapes, starts):
    """[G, S, D] -> [G, S, 4D] quad table over all levels (G = any merged
    leading dims, e.g. M*B — keeps the leading dim >= 8 so the build never
    tiles as T(2,128) at small batch)."""
    g, s, d = value_g.shape
    quads = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value_g[:, starts[lvl] : starts[lvl] + h * w].reshape(
            g, h, w, d
        )
        quads.append(
            _build_quad(v, axis_x=2, axis_y=1).reshape(g, h * w, 4 * d)
        )
    return jnp.concatenate(quads, axis=1)


_FLAT_DNUMS = jax.lax.GatherDimensionNumbers(
    offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
)


@jax.custom_vjp
def _rows_gather(tbl, rows):
    """tbl [N, C], rows [R] int32 -> [R, C] flat row gather.

    Custom VJP: XLA autodiff's transpose of this gather emits a scatter
    variant that runs ~40x slower than a plain `.at[rows].add` scatter-add
    on TPU (measured: quad_unroll fwd 60 ms but autodiff fwd+bwd 2.5 s at
    flagship scale vs ~20 ms for the equivalent scatter in
    scripts/scatter_bw_probe.py). The hand-written backward uses the fast
    form; semantics identical (clip mode on indices).
    """
    return jax.lax.gather(
        tbl, rows[:, None], _FLAT_DNUMS,
        slice_sizes=(1, tbl.shape[1]), mode="clip",
    ).reshape(rows.shape[0], tbl.shape[1])


def _rows_gather_fwd(tbl, rows):
    return _rows_gather(tbl, rows), (rows, tbl.shape[0])


def _rows_gather_bwd(res, dg):
    rows, n = res
    rows_c = jnp.clip(rows, 0, n - 1)  # match the forward's clip mode
    dtbl = jnp.zeros((n, dg.shape[1]), dg.dtype).at[rows_c].add(dg)
    return dtbl, None


_rows_gather.defvjp(_rows_gather_fwd, _rows_gather_bwd)


def _flat_cell_index(sampling_locations, spatial_shapes, starts,
                     valid_extents=None):
    """Per-sample flat cell index + folded 4-corner weights.

    sampling_locations [..., L, P, 2] -> (idx [..., L, P] int32 into the
    all-level quad table, w4 [..., L, P, 4] corner weights).

    valid_extents [B, L, 2] (optional): per-level (valid_h, valid_w) float
    cell counts of the un-padded region. When given, corners landing in the
    padded region (y >= valid_h or x >= valid_w — padding in this codebase
    is always a bottom/right rectangle, the same assumption
    deformable_transformer.get_valid_ratio makes) get their weight zeroed.
    This makes the weight sum match the exact project-then-gather path,
    which zeroes the projected value INCLUDING the value_proj bias at
    padded positions — the gather-then-project path restores the bias via
    the weight sum, so pad-hitting corners must not contribute to it.
    Requires leading dims (B, ...)."""
    h_arr = jnp.asarray([h for h, _ in spatial_shapes], jnp.float32)
    w_arr = jnp.asarray([w for _, w in spatial_shapes], jnp.float32)
    w_int = jnp.asarray([w for _, w in spatial_shapes], jnp.int32)
    st = jnp.asarray(starts, jnp.int32)
    shp = (1,) * (sampling_locations.ndim - 3)
    hf = h_arr.reshape(*shp, -1, 1)
    wf = w_arr.reshape(*shp, -1, 1)
    x = sampling_locations[..., 0] * wf - 0.5
    y = sampling_locations[..., 1] * hf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx, x0c = _quad_slot_weights(x0, x - x0, wf)
    wy, y0c = _quad_slot_weights(y0, y - y0, hf)
    if valid_extents is not None:
        b, l = valid_extents.shape[:2]
        eshp = (b,) + (1,) * (sampling_locations.ndim - 4) + (l, 1)
        vh = valid_extents[..., 0].reshape(eshp)
        vw = valid_extents[..., 1].reshape(eshp)
        # slot j of the quad row is the corner at column c0c + j (for every
        # nonzero-weight shift case of _quad_slot_weights)
        vx = jnp.stack(
            [x0c.astype(jnp.float32) + j < vw for j in range(2)], -1
        )
        vy = jnp.stack(
            [y0c.astype(jnp.float32) + j < vh for j in range(2)], -1
        )
        wx = wx * vx
        wy = wy * vy
    w4 = (wy[..., :, None] * wx[..., None, :]).reshape(*x.shape, 4)
    idx = st.reshape(*shp, -1, 1) + y0c * w_int.reshape(*shp, -1, 1) + x0c
    return idx, w4


# batched per-head quad tables above this size fall out of the fast
# gather tier (~31 GB/s below ~20 MB, ~14 GB/s above; gather_bw_probe).
# Measured at flagship encoder shapes (batch_scaling_probe, v5e): B4
# batched (19 MB tables) 4.17 ms/img vs per-element (5 MB) 3.50 ms/img;
# B8 3.58 vs 2.60. Below the threshold, batched wins (dispatch
# amortization: B1 8.83 ms/img vs B4 batched 4.17).
_BATCH_UNROLL_TABLE_BYTES = 12 * 2**20


@functools.partial(
    jax.jit, static_argnames=("spatial_shapes", "batch_unroll")
)
def ms_deform_attn_quad_unroll(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    value_scale: jnp.ndarray | None = None,  # [B, M] per-head dequant scale
    # (value may then be int8: halves gather bytes AND table size — both
    # measured gather-speed levers; the scale folds into the corner
    # weights per head, so dequantization is free)
    batch_unroll: bool | None = None,  # None = auto by table size
) -> jnp.ndarray:
    """THE production formulation: quad-table rows + per-head UNROLLED flat
    gathers. Exact semantics (oracle: tests/test_msda.py).

    Why fastest (scripts/gather_bw_probe.py, v5e):
    - gathers whose slice spans >1 major-dim row run at 0.2-2 GB/s; flat
      [1, C] single-row gathers run fast -> pre-interleave each cell's 2x2
      bilinear corners into one [1, 4D] row (two dense shifted concats);
    - gather operands with BATCH dims (from vmap) hit a slow emitter ->
      unroll the head loop into M separate un-batched gathers;
    - tables <= ~20 MB gather at ~31 GB/s vs ~14 GB/s above -> per-head
      all-level quad table is ~7 MB at flagship scale, in the fast tier;
    - at batch >= 4 the batched table leaves the fast tier -> unroll the
      BATCH loop too (per-element gathers against B1-size tables; exact —
      identical adds per output element; see batch_scaling_probe.py).
    """
    b, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    starts = level_start_index(spatial_shapes)
    compute_dtype = (
        value.dtype if value_scale is None else value_scale.dtype
    )

    if b == 1:
        # B=1 (the flagship serving path) keeps its own graph: the
        # [B, M, S, 4D] table build fuses into the producing elementwise
        # ops and every vq[:, hm] slice is free at B=1. Routing B=1
        # through the B>1 head-major/BLq formulation below re-materializes
        # the 5 high-level-layer tables (+0.92 ms/frame of
        # [8,1,22500,144] builds) and deoptimizes the decoder gather
        # fusion (0.08 -> 0.14 ms x 10) — a measured 40.0 -> 37.7 fps
        # headline regression (profile_top_ops, r4).
        value_t = value.transpose(0, 2, 1, 3)  # [1, M, S, D]
        vq1 = _quad_all_levels(value_t, spatial_shapes, starts)
        idx, w4 = _flat_cell_index(
            sampling_locations, spatial_shapes, starts
        )
        idx = idx.transpose(2, 0, 1, 3, 4).reshape(m, lq * l * p)
        w4 = (
            w4 * attention_weights[..., None]
        ).transpose(2, 0, 1, 3, 4, 5).reshape(m, lq, l * p, 4)
        k_samp = l * p
        outs = []
        for hm in range(m):
            w_h = w4[hm]
            if value_scale is not None:
                w_h = w_h * value_scale[0, hm]
            tbl = vq1[0, hm]  # [S, 4D]
            rows = idx[hm].reshape(lq, k_samp).T.reshape(lq * k_samp)
            g = _rows_gather(tbl, rows)  # [K*Lq, 4D]
            wf = (
                w_h.transpose(1, 0, 2)
                .reshape(lq * k_samp, 4).astype(compute_dtype)
            )
            acc = wf[:, 0:1] * g[:, :d]
            for c4 in range(1, 4):
                acc = acc + wf[:, c4 : c4 + 1] * g[:, c4 * d : (c4 + 1) * d]
            outs.append(jnp.sum(acc.reshape(k_samp, lq, d), axis=0))
        out = jnp.stack(outs, axis=1)  # [Lq, M, D]
        return out.reshape(1, lq, m * d).astype(jnp.float32)

    # HEAD-MAJOR table [M, B, S, 4D]: every per-head slice vq[hm] (batched
    # path) and per-head-per-element slice vq[hm, e] (unrolled path) is a
    # CONTIGUOUS bitcast. The old [B, M, S, 4D] layout made vq[:, hm] a
    # strided slice — free at B=1 but a real 0.5 ms copy per layer at B=2
    # (profiled slice_bitcast_fusion tuples, 800x1440).
    value_h = value.transpose(2, 0, 1, 3)  # [M, B, S, D]
    vq = _quad_all_levels_flat(
        value_h.reshape(m * b, s, d), spatial_shapes, starts
    ).reshape(m, b, s, 4 * d)

    # Collapse (B, Lq) -> BLq BEFORE any index/weight math: the graph then
    # matches the B=1 graph with Lq' = B*Lq, which XLA lowers to flat
    # s32[R]/f32[R,4] scalar-tiled ops. Keeping the 6-D [B, Lq, M, L, P, *]
    # forms at B>=2 produced T(2,128)-tiled fusions and relayout copies
    # worth ~10 ms/img at 800x1440 B=2 (profile_top_ops, r4).
    blq = b * lq
    k_samp = l * p
    idx, w4 = _flat_cell_index(
        sampling_locations.reshape(blq, m, l, p, 2), spatial_shapes, starts
    )
    # per-element row offset into the [B*S] flat table, added while idx is
    # still [BLq, M, L*P] (row value e*S + cell)
    idx = idx.reshape(blq, m, k_samp)
    if b > 1:
        eofs = jnp.repeat(
            jnp.arange(b, dtype=jnp.int32) * s, lq
        )  # [BLq]
        idx_flat = idx + eofs[:, None, None]
    else:
        idx_flat = idx
    w4 = (
        w4 * attention_weights.reshape(blq, m, l, p)[..., None]
    ).reshape(blq, m, k_samp, 4)
    # [BLq, M, K(, 4)] -> [M, BLq, K(, 4)]
    idx_flat = idx_flat.transpose(1, 0, 2)
    idx = idx.transpose(1, 0, 2)
    w4 = w4.transpose(1, 0, 2, 3)

    if batch_unroll is None:
        batch_unroll = (
            b > 1
            and b * s * 4 * d * value.dtype.itemsize
            > _BATCH_UNROLL_TABLE_BYTES
        )

    r = blq * k_samp
    outs = []
    for hm in range(m):
        # SAMPLE-MAJOR row order (r = k * B*Lq + q): the consumer stays in
        # the gather's [R, 4D] row-major layout — corner reduce as 4
        # lane-sliced multiply-adds, sample reduce as a free major-dim
        # reshape + axis-0 sum. The q-major einsum formulation forced a
        # T(4,128) relayout of the whole gather output plus a kLoop
        # reduction, each about as expensive as the gather itself.
        w_h = w4[hm]  # [BLq, K, 4]
        if value_scale is not None:
            w_h = w_h * jnp.repeat(value_scale[:, hm], lq)[:, None, None]
        if batch_unroll:
            outs_e = []
            for e in range(b):
                tbl = vq[hm, e]  # [S, 4D] — B1-size fast-tier table
                rows = idx[hm, e * lq : (e + 1) * lq].T.reshape(lq * k_samp)
                g = _rows_gather(tbl, rows)  # [K*Lq, 4D]
                wf = (
                    w_h[e * lq : (e + 1) * lq].transpose(1, 0, 2)
                    .reshape(lq * k_samp, 4).astype(compute_dtype)
                )
                acc = wf[:, 0:1] * g[:, :d]
                for c4 in range(1, 4):
                    acc = acc + wf[:, c4 : c4 + 1] * g[:, c4 * d : (c4 + 1) * d]
                outs_e.append(
                    jnp.sum(acc.reshape(k_samp, lq, d), axis=0)
                )
            outs.append(jnp.stack(outs_e, axis=0))  # [B, Lq, D]
            continue
        tbl = vq[hm].reshape(b * s, 4 * d)  # contiguous view
        rows = idx_flat[hm].T.reshape(r)  # [K*BLq], k-major
        g = _rows_gather(tbl, rows)  # [K*B*Lq, 4D]
        wf = w_h.transpose(1, 0, 2).reshape(r, 4).astype(compute_dtype)
        acc = wf[:, 0:1] * g[:, :d]
        for c4 in range(1, 4):
            acc = acc + wf[:, c4 : c4 + 1] * g[:, c4 * d : (c4 + 1) * d]
        outs.append(
            jnp.sum(acc.reshape(k_samp, blq, d), axis=0).reshape(b, lq, d)
        )
    out = jnp.stack(outs, axis=2)  # [B, Lq, M, D]
    return out.reshape(b, lq, m * d).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("spatial_shapes",))
def build_raw_quad(
    src: jnp.ndarray,  # [B, S, C] (pad rows already zeroed by the caller)
    spatial_shapes: Sequence[Tuple[int, int]],
) -> jnp.ndarray:
    """[B, S, C] -> [B, S, 4C] per-level 2x2-corner quad table (the value
    table ms_deform_attn_raw_pool gathers from). Exposed so callers can
    build it once and CACHE the per-frame halves across tracker steps:
    with cache_prev_encoder the prev half equals last frame's cur half."""
    b, s, c = src.shape
    starts = level_start_index(spatial_shapes)
    quads = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = src[:, starts[lvl] : starts[lvl] + h * w].reshape(b, h, w, c)
        quads.append(
            _build_quad(v, axis_x=2, axis_y=1).reshape(b, h * w, 4 * c)
        )
    return jnp.concatenate(quads, axis=1)


def quantize_rows(src: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, S, C] -> (int8 [B, S, C], scale [B]) symmetric per-batch-element
    quantization for int8 quad tables (dec_msda_int8). A SCALAR scale per
    table (not per channel) so it can fold into the pooling weights per
    LEVEL — the cached prev-frame half carries its own frame's scale."""
    absmax = jnp.max(jnp.abs(src.astype(jnp.float32)), axis=(1, 2))
    scale = jnp.maximum(absmax / 127.0, 1e-8)  # [B]
    q8 = jnp.clip(
        jnp.round(src.astype(jnp.float32) / scale[:, None, None]), -127, 127
    ).astype(jnp.int8)
    return q8, scale


def ms_deform_attn_raw_pool(
    src: jnp.ndarray,  # [B, S, C] RAW (pre-value-projection) features
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,  # [B, Lq, M, L, P, 2]
    attention_weights: jnp.ndarray,  # [B, Lq, M, L, P]
    src_quad: jnp.ndarray | None = None,  # prebuilt quad table [B, S, 4C]
    valid_extents: jnp.ndarray | None = None,  # [B, L, 2] (vh, vw) per
    # level — zeroes pad-hitting corner weights so the weight sum (the
    # bias-restore weight) matches the exact path, which zeroes the
    # projected value incl. bias at padded rows; see _flat_cell_index
    quad_scales: jnp.ndarray | None = None,  # [B, L] per-level dequant
    # scale of an int8 src_quad (dec_msda_int8): halves the gather bytes
    # of the byte-bound decoder rows; folded into the pooling weights so
    # dequantization is free. The weight SUM stays unscaled (it restores
    # the value_proj bias).
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather-then-project formulation, pooling stage: bilinear-sample RAW
    src rows (before the value projection) and reduce over samples/corners.

    Returns (pooled [B, Lq, M, C], weight_sum [B, Lq, M]). The caller
    applies the value projection AFTER pooling — exact by linearity:
      sum_k w_k * (src_k @ Wv + b) = (sum_k w_k * src_k) @ Wv + (sum_k w_k) b.

    Why: for DECODER cross-attention the per-query sample count is small
    (Lq*L*P rows/head ~ 19k at flagship scale), so per-layer per-head quad
    VALUE tables (the dominant decoder-MSDA cost: ~10 ms/frame of builds,
    reference-equivalent semantics ms_deform_attn_func.py:34-54) are pure
    overhead. Sampling raw rows instead needs ONE quad table of the raw
    memory, which is identical for every decoder layer, so XLA CSE builds
    it once per frame. Quad rows are [1, 4C] = 9 exact 128-lane tiles at
    C=288 (no pad waste; cf. the per-head [1,144]->256-lane padded rows).
    """
    b, s, c = src.shape
    _, lq, m, l, p, _ = sampling_locations.shape
    starts = level_start_index(spatial_shapes)
    compute_dtype = src.dtype

    if src_quad is None:
        src_quad = build_raw_quad(src, spatial_shapes)

    if b == 1:
        # B=1 serving path keeps its own graph — see the matching branch
        # in ms_deform_attn_quad_unroll: the BLq-collapsed form below
        # deoptimizes the decoder gather fusions at B=1 (0.08 -> 0.14 ms
        # x 10 ops/frame, profile_top_ops r4).
        idx, w4 = _flat_cell_index(
            sampling_locations, spatial_shapes, starts, valid_extents
        )
        w = w4 * attention_weights[..., None]  # [1, Lq, M, L, P, 4]
        if quad_scales is not None:
            w_pool = w * quad_scales[:, None, None, :, None, None]
        else:
            w_pool = w
        idx = idx.transpose(2, 0, 1, 3, 4).reshape(m, lq * l * p)
        w_pool = w_pool.transpose(2, 0, 1, 3, 4, 5).reshape(
            m, lq, l * p, 4
        )
        w = w.transpose(2, 0, 1, 3, 4, 5).reshape(m, lq, l * p, 4)
        k_samp = l * p
        r = lq * k_samp
        pooled, wsum = [], []
        vq1 = src_quad.reshape(s, 4 * c)
        for hm in range(m):
            rows = idx[hm].reshape(lq, k_samp).T.reshape(r)
            g = _rows_gather(vq1, rows)  # [K*Lq, 4C]
            wf = (
                w_pool[hm].transpose(1, 0, 2)
                .reshape(r, 4).astype(compute_dtype)
            )
            acc = wf[:, 0:1] * g[:, :c]
            for c4 in range(1, 4):
                acc = acc + wf[:, c4 : c4 + 1] * g[:, c4 * c : (c4 + 1) * c]
            red = jnp.sum(
                acc.reshape(k_samp, lq, c).astype(jnp.float32), axis=0
            )
            pooled.append(red.reshape(1, lq, c).astype(compute_dtype))
            wsum.append(jnp.sum(w[hm], axis=(1, 2)).reshape(1, lq))
        return (
            jnp.stack(pooled, axis=2),  # [1, Lq, M, C]
            jnp.stack(wsum, axis=2).astype(jnp.float32),  # [1, Lq, M]
        )

    # collapse (B, Lq) -> BLq before any index/weight math — same reason
    # as ms_deform_attn_quad_unroll: the flattened graph matches the B=1
    # lowering (flat scalar-tiled index ops) instead of T(2,128)-tiled 6-D
    # fusions at small batch
    blq = b * lq
    idx, w4 = _flat_cell_index(
        sampling_locations.reshape(blq, m, l, p, 2), spatial_shapes, starts,
        None if valid_extents is None
        else jnp.repeat(valid_extents, lq, axis=0),
    )
    w = (
        w4 * attention_weights.reshape(blq, m, l, p)[..., None]
    )  # [BLq, M, L, P, 4]
    if quad_scales is not None:
        # int8 table: fold the per-level dequant scale into the POOLING
        # weights only (wsum below uses the unscaled w)
        w_pool = w * jnp.repeat(
            quad_scales, lq, axis=0
        )[:, None, :, None, None]
    else:
        w_pool = w
    # [BLq, M, L, P(, 4)] -> [M, BLq, L*P(, 4)]
    k_samp = l * p
    idx = idx.reshape(blq, m, k_samp)
    if b > 1:
        idx = idx + jnp.repeat(
            jnp.arange(b, dtype=jnp.int32) * s, lq
        )[:, None, None]
    idx = idx.transpose(1, 0, 2)
    w_pool = w_pool.reshape(blq, m, k_samp, 4).transpose(1, 0, 2, 3)
    w = w.reshape(blq, m, k_samp, 4).transpose(1, 0, 2, 3)

    # NOTE: a per-batch-element unroll (as in ms_deform_attn_quad_unroll)
    # was tried here too for the B>1 train path — the decoder raw table
    # grows 76 MB (B1) -> 305 MB (B4) — but with 8 heads x B elements x 6
    # decoder layers the graph ballooned compile time past usability on
    # the remote compile service; reverted (see git history). The flagship
    # inference/DP path is batch-1-per-chip, where the batched and
    # unrolled forms coincide.
    r = blq * k_samp
    pooled, wsum = [], []
    vq = src_quad.reshape(b * s, 4 * c)
    for hm in range(m):
        # SAMPLE-MAJOR row order: r = k * (B*Lq) + q. The consumer then
        # never leaves the gather's [R, *] row-major layout — corner reduce
        # is 4 lane-sliced multiply-adds, sample reduce is a major-dim
        # reshape (free) + axis-0 sum (K-way tensor add). The q-major order
        # needed a T(4,128) relayout of the whole gather output (~0.2 ms
        # x heads x layers), and a reduce_window lowered to a conv that
        # was just as slow.
        rows = idx[hm].T.reshape(r)  # [K*BLq], k-major
        g = _rows_gather(vq, rows)  # [K*B*Lq, 4C]
        wf = (
            w_pool[hm].transpose(1, 0, 2)
            .reshape(r, 4).astype(compute_dtype)
        )
        acc = wf[:, 0:1] * g[:, :c]
        for c4 in range(1, 4):
            acc = acc + wf[:, c4 : c4 + 1] * g[:, c4 * c : (c4 + 1) * c]
        red = jnp.sum(
            acc.reshape(k_samp, blq, c).astype(jnp.float32), axis=0
        )
        pooled.append(red.reshape(b, lq, c).astype(compute_dtype))
        wsum.append(jnp.sum(w[hm], axis=(1, 2)).reshape(b, lq))
    return (
        jnp.stack(pooled, axis=2),  # [B, Lq, M, C]
        jnp.stack(wsum, axis=2).astype(jnp.float32),  # [B, Lq, M]
    )


@functools.partial(jax.jit, static_argnames=("spatial_shapes", "top_k"))
def ms_deform_attn_topk_quad(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    top_k: int = 8,
) -> jnp.ndarray:
    """DEFA-style top-k pruning on the quad-table fast path: per (query,
    head) gather only the top_k of L*P samples by attention weight — bytes
    AND rows scale by top_k/(L*P) on top of ms_deform_attn_quad_unroll's
    row-rate win. Oracle: full op with non-top-k weights zeroed."""
    b, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    k = min(top_k, l * p)
    starts = level_start_index(spatial_shapes)
    compute_dtype = value.dtype
    value_t = value.transpose(0, 2, 1, 3)
    vq = _quad_all_levels(value_t, spatial_shapes, starts)

    idx, w4 = _flat_cell_index(sampling_locations, spatial_shapes, starts)
    aw_f = attention_weights.reshape(b, lq, m, l * p)
    top_w, top_i = jax.lax.top_k(aw_f, k)  # [B, Lq, M, K]
    idx_f = idx.reshape(b, lq, m, l * p)
    idx_k = jnp.take_along_axis(idx_f, top_i, axis=3)  # [B, Lq, M, K]
    w4_f = w4.reshape(b, lq, m, l * p, 4)
    w4_k = jnp.take_along_axis(w4_f, top_i[..., None], axis=3)
    w4_k = w4_k * top_w[..., None]

    idx_k = idx_k.transpose(2, 0, 1, 3).reshape(m, b, lq * k)
    w4_k = w4_k.transpose(2, 0, 1, 3, 4).reshape(m, b, lq, k, 4)
    bofs = jnp.arange(b, dtype=jnp.int32).reshape(b, 1) * s
    outs = []
    for hm in range(m):
        tbl = vq[:, hm].reshape(b * s, 4 * d)
        rows = (idx_k[hm] + bofs).reshape(b * lq * k)
        g = _rows_gather(tbl, rows).reshape(b, lq, k, 4, d)
        outs.append(
            jnp.einsum("bqkc,bqkcd->bqd", w4_k[hm].astype(compute_dtype), g)
        )
    out = jnp.stack(outs, axis=2)
    return out.reshape(b, lq, m * d).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("spatial_shapes",))
def ms_deform_attn_quad_fold(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Quad-table gather with (batch, head, level) FOLDED into the row index:
    one un-batched flat [1, 4D] row gather over a single [B*M*S, 4D] quad
    table per layer. Batch dims on lax.gather demote it to a slow emitter on
    TPU (scripts/gather_bw_probe.py: 0.2-2 GB/s batched/multi-row vs 30-45
    GB/s flat single-row); folding keeps the fast path. Exact semantics.
    """
    b, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    starts = level_start_index(spatial_shapes)
    compute_dtype = value.dtype
    value_t = value.transpose(0, 2, 1, 3)  # [B, M, S, D]

    # build the per-level quad tables, concatenated back to [B, M, S, 4D]
    quads = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value_t[:, :, starts[lvl] : starts[lvl] + h * w].reshape(
            b, m, h, w, d
        )
        quads.append(
            _build_quad(v, axis_x=3, axis_y=2).reshape(b, m, h * w, 4 * d)
        )
    vq = jnp.concatenate(quads, axis=2).reshape(b * m * s, 4 * d)

    h_arr = jnp.asarray([h for h, _ in spatial_shapes], jnp.float32)
    w_arr = jnp.asarray([w for _, w in spatial_shapes], jnp.float32)
    w_int = jnp.asarray([w for _, w in spatial_shapes], jnp.int32)
    st = jnp.asarray(starts, jnp.int32)

    loc_t = sampling_locations.transpose(0, 2, 1, 3, 4, 5)  # [B,M,Lq,L,P,2]
    aw_t = attention_weights.transpose(0, 2, 1, 3, 4)  # [B,M,Lq,L,P]
    x = loc_t[..., 0] * w_arr[None, None, None, :, None] - 0.5
    y = loc_t[..., 1] * h_arr[None, None, None, :, None] - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx, x0c = _quad_slot_weights(x0, x - x0, w_arr[None, None, None, :, None])
    wy, y0c = _quad_slot_weights(y0, y - y0, h_arr[None, None, None, :, None])
    w4 = (wy[..., :, None] * wx[..., None, :]).reshape(
        b, m, lq, l, p, 4
    ) * aw_t[..., None]

    cell = st[None, None, None, :, None] + y0c * w_int[None, None, None, :, None] + x0c
    bm = (
        jnp.arange(b * m, dtype=jnp.int32).reshape(b, m, 1, 1, 1) * s
    )
    idx = (bm + cell).reshape(b * m * lq * l * p, 1)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2),
        collapsed_slice_dims=(),
        start_index_map=(0,),
    )
    g = jax.lax.gather(
        vq, idx, dnums, slice_sizes=(1, 4 * d), mode="clip"
    ).reshape(b, m, lq, l * p, 4, d)
    out = jnp.einsum(
        "bmqkc,bmqkcd->bmqd",
        w4.reshape(b, m, lq, l * p, 4).astype(compute_dtype),
        g,
    )
    return out.transpose(0, 2, 1, 3).reshape(b, lq, m * d).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("spatial_shapes",))
def ms_deform_attn_quad_shared_fold(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,  # [B, Lq, L, P, 2] — shared over heads
    attention_weights: jnp.ndarray,  # [B, Lq, M, L, P]
) -> jnp.ndarray:
    """Head-shared + index-folded quad gather: one un-batched [1, 4*M*D] row
    per (sample, level) from a [B*S, 4*M*D] quad table."""
    b, s, m, d = value.shape
    _, lq, l, p, _ = sampling_locations.shape
    starts = level_start_index(spatial_shapes)
    compute_dtype = value.dtype
    value_f = value.reshape(b, s, m * d)

    quads = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value_f[:, starts[lvl] : starts[lvl] + h * w].reshape(
            b, h, w, m * d
        )
        quads.append(
            _build_quad(v, axis_x=2, axis_y=1).reshape(b, h * w, 4 * m * d)
        )
    vq = jnp.concatenate(quads, axis=1).reshape(b * s, 4 * m * d)

    h_arr = jnp.asarray([h for h, _ in spatial_shapes], jnp.float32)
    w_arr = jnp.asarray([w for _, w in spatial_shapes], jnp.float32)
    w_int = jnp.asarray([w for _, w in spatial_shapes], jnp.int32)
    st = jnp.asarray(starts, jnp.int32)

    x = sampling_locations[..., 0] * w_arr[None, None, :, None] - 0.5
    y = sampling_locations[..., 1] * h_arr[None, None, :, None] - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx, x0c = _quad_slot_weights(x0, x - x0, w_arr[None, None, :, None])
    wy, y0c = _quad_slot_weights(y0, y - y0, h_arr[None, None, :, None])
    w4 = (wy[..., :, None] * wx[..., None, :]).reshape(b, lq, l * p, 4)

    cell = st[None, None, :, None] + y0c * w_int[None, None, :, None] + x0c
    bofs = jnp.arange(b, dtype=jnp.int32).reshape(b, 1, 1, 1) * s
    idx = (bofs + cell).reshape(b * lq * l * p, 1)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2),
        collapsed_slice_dims=(),
        start_index_map=(0,),
    )
    g = jax.lax.gather(
        vq, idx, dnums, slice_sizes=(1, 4 * m * d), mode="clip"
    ).reshape(b, lq, l * p, 4, m, d)
    sampled = jnp.einsum(
        "bqkc,bqkcmd->bqkmd", w4.astype(compute_dtype), g
    )
    aw_k = attention_weights.transpose(0, 1, 3, 4, 2).reshape(b, lq, l * p, m)
    out = jnp.einsum("bqkm,bqkmd->bqmd", aw_k.astype(compute_dtype), sampled)
    return out.reshape(b, lq, m * d).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("spatial_shapes",))
def ms_deform_attn_quad_shared(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,  # [B, Lq, L, P, 2] — shared over heads
    attention_weights: jnp.ndarray,  # [B, Lq, M, L, P]
) -> jnp.ndarray:
    """Quad-table flat-row gather with head-shared sampling locations: one
    [1, 4*M*D] row per (sample, level) fetches all heads' 2x2 neighborhoods
    — M x fewer rows than ms_deform_attn_quad on top of its row-rate win."""
    b, s, m, d = value.shape
    _, lq, l, p, _ = sampling_locations.shape
    starts = level_start_index(spatial_shapes)
    compute_dtype = value.dtype
    value_f = value.reshape(b, s, m * d)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2),
        collapsed_slice_dims=(),
        start_index_map=(0,),
    )

    def gather_rows(vq, idx):
        return jax.lax.gather(
            vq, idx, dnums, slice_sizes=(1, 4 * m * d), mode="clip"
        )

    gather_b = jax.vmap(gather_rows)

    out = jnp.zeros((b, lq, m, d), compute_dtype)
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value_f[:, starts[lvl] : starts[lvl] + h * w].reshape(
            b, h, w, m * d
        )
        vq = _build_quad(v, axis_x=2, axis_y=1).reshape(b, h * w, 4 * m * d)
        loc = sampling_locations[:, :, lvl]  # [B, Lq, P, 2]
        aw = attention_weights[:, :, :, lvl]  # [B, Lq, M, P]
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx, x0c = _quad_slot_weights(x0, x - x0, w)  # [B, Lq, P, 2]
        wy, y0c = _quad_slot_weights(y0, y - y0, h)
        w4 = (wy[..., :, None] * wx[..., None, :]).reshape(b, lq, p, 4)
        idx = (y0c * w + x0c).reshape(b, lq * p, 1)
        g = gather_b(vq, idx).reshape(b, lq, p, 4, m, d)
        sampled = jnp.einsum(
            "bqpc,bqpcmd->bqpmd", w4.astype(compute_dtype), g
        )
        out = out + jnp.einsum(
            "bqmp,bqpmd->bqmd", aw.astype(compute_dtype), sampled
        )
    return out.reshape(b, lq, m * d).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("spatial_shapes", "top_k"))
def ms_deform_attn_topk(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    top_k: int = 8,
) -> jnp.ndarray:
    """DEFA-style pruned sampling (PAPERS.md: arxiv 2403.10913): per (query,
    head), gather only the `top_k` of the L*P samples with the largest
    attention weights — XLA TPU gather cost is per ROW, so rows (and time)
    scale by top_k / (L*P). Weights are NOT renormalized (the softmax stays
    over all L*P slots, pruned samples contribute 0 — they were near-0
    anyway once trained).

    Selected samples mix levels per row, so the gather operand is a
    zero-padded level tower [L, Hp, Wp, D] per (batch, head) and each row
    fetches a [1, 2, 2, D] patch at (level, y0, x0).
    """
    b, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    k = min(top_k, l * p)
    starts = level_start_index(spatial_shapes)
    compute_dtype = value.dtype
    hp = max(max(h for h, _ in spatial_shapes), 2)
    wp = max(max(w for _, w in spatial_shapes), 2)

    value_t = value.transpose(0, 2, 1, 3)  # [B, M, S, D]
    tower = jnp.zeros((b, m, l, hp, wp, d), compute_dtype)
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value_t[:, :, starts[lvl] : starts[lvl] + h * w].reshape(
            b, m, 1, h, w, d
        )
        tower = jax.lax.dynamic_update_slice(tower, v, (0, 0, lvl, 0, 0, 0))

    # top-k samples by attention weight, per (query, head)
    aw_f = attention_weights.reshape(b, lq, m, l * p)
    top_w, top_i = jax.lax.top_k(aw_f, k)  # [B, Lq, M, K]
    loc_f = sampling_locations.reshape(b, lq, m, l * p, 2)
    loc_k = jnp.take_along_axis(loc_f, top_i[..., None], axis=3)
    lvl_k = (top_i // p).astype(jnp.int32)  # [B, Lq, M, K]

    h_arr = jnp.asarray([h for h, _ in spatial_shapes], jnp.float32)
    w_arr = jnp.asarray([w for _, w in spatial_shapes], jnp.float32)
    hf = h_arr[lvl_k]  # [B, Lq, M, K]
    wf = w_arr[lvl_k]
    x = loc_k[..., 0] * wf - 0.5
    y = loc_k[..., 1] * hf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx, x0c = _slot_weights(x0, x - x0, wf, jnp.maximum(wf, 2.0))
    wy, y0c = _slot_weights(y0, y - y0, hf, jnp.maximum(hf, 2.0))
    w22 = (wy[..., :, None] * wx[..., None, :]) * top_w[..., None, None]

    # [B, M, Lq*K, 3] start indices (level, y0, x0)
    idx = jnp.stack([lvl_k.astype(jnp.int32), y0c, x0c], -1)  # [B,Lq,M,K,3]
    idx = idx.transpose(0, 2, 1, 3, 4).reshape(b, m, lq * k, 3)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2),
    )

    def gather_patches(tw, ix):
        # tw [L, Hp, Wp, D], ix [R, 3] -> [R, 2, 2, D]
        return jax.lax.gather(
            tw, ix, dnums, slice_sizes=(1, 2, 2, d), mode="clip"
        )

    g = jax.vmap(jax.vmap(gather_patches))(tower, idx)
    g = g.reshape(b, m, lq, k, 2, 2, d)
    w22 = w22.transpose(0, 2, 1, 3, 4, 5)  # [B, M, Lq, K, 2, 2]
    out = jnp.einsum(
        "bmqkyx,bmqkyxd->bmqd", w22.astype(compute_dtype), g
    )
    return out.transpose(0, 2, 1, 3).reshape(b, lq, m * d).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("spatial_shapes",))
def ms_deform_attn_patch_shared(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,  # [B, Lq, L, P, 2] — SHARED over heads
    attention_weights: jnp.ndarray,  # [B, Lq, M, L, P] — still per head
) -> jnp.ndarray:
    """Head-shared sampling locations: all M heads sample the same (level,
    point) positions (attention weights stay per-head). One [2, 2, M*D]
    patch row per (sample, level) fetches every head's values — M× fewer
    gather rows than the per-head formulation (gather cost is per row).
    """
    b, s, m, d = value.shape
    _, lq, l, p, _ = sampling_locations.shape
    starts = level_start_index(spatial_shapes)
    compute_dtype = value.dtype
    value_f = value.reshape(b, s, m * d)  # heads fused into the row

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    def gather_patches(vg, idx):
        # vg [H, W, M*D], idx [R, 2] -> [R, 2, 2, M*D]
        return jax.lax.gather(
            vg, idx, dnums, slice_sizes=(2, 2, m * d), mode="clip"
        )

    gather_b = jax.vmap(gather_patches)

    out = jnp.zeros((b, lq, m, d), compute_dtype)
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value_f[:, starts[lvl] : starts[lvl] + h * w].reshape(
            b, h, w, m * d
        )
        hpd, wpd = max(h, 2), max(w, 2)
        if (hpd, wpd) != (h, w):
            v = jnp.pad(v, ((0, 0), (0, hpd - h), (0, wpd - w), (0, 0)))
        loc = sampling_locations[:, :, lvl]  # [B, Lq, P, 2]
        aw = attention_weights[:, :, :, lvl]  # [B, Lq, M, P]
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx, x0c = _slot_weights(x0, x - x0, w, wpd)  # [B, Lq, P, 2]
        wy, y0c = _slot_weights(y0, y - y0, h, hpd)
        w22 = wy[..., :, None] * wx[..., None, :]  # [B, Lq, P, 2, 2]
        idx = jnp.stack([y0c, x0c], -1).reshape(b, lq * p, 2)
        g = gather_b(v, idx).reshape(b, lq, p, 2, 2, m, d)
        # corner-reduce first (keeps the big tensor out of the attn einsum)
        sampled = jnp.einsum(
            "bqpyx,bqpyxmd->bqpmd", w22.astype(compute_dtype), g
        )
        out = out + jnp.einsum(
            "bqmp,bqpmd->bqmd", aw.astype(compute_dtype), sampled
        )
    return out.reshape(b, lq, m * d).astype(jnp.float32)


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
