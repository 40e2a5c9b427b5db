"""Compare MSDA gather-consumer formulations at flagship enc-full-layer
scale. The trace shows per (head, layer): gather 1.16ms -> T(4,128)
reshape 1.1ms -> reduce einsum 1.04ms. Try consumers that stay in the
gather's [R, 4D] T(8,128) layout."""
import time, functools, sys

import jax, jax.numpy as jnp

B, S, M, D = 1, 23924, 8, 36
LQ, LP = 23924, 16  # full encoder layer: L=4, P=4
R = LQ * LP

key = jax.random.PRNGKey(0)
tbl = jax.random.normal(key, (S, 4 * D), jnp.bfloat16)          # one head's quad table
# spatially LOCAL rows (the real access pattern: query q samples cells
# near q): row = query cell + small jitter, like learned offsets of a few
# cells in a [100,180]-ish grid
q_cell = jnp.repeat(jnp.arange(LQ, dtype=jnp.int32), LP)
jit = jax.random.randint(key, (R,), -360, 360, jnp.int32)  # +-2 rows of 180
rows = jnp.clip(q_cell + jit, 0, S - 1)
w4 = jax.random.normal(key, (LQ, LP, 4), jnp.float32).astype(jnp.bfloat16)

_FLAT_DNUMS = jax.lax.GatherDimensionNumbers(
    offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
)

def gather_rows(tbl, rows):
    return jax.lax.gather(
        tbl, rows[:, None], _FLAT_DNUMS,
        slice_sizes=(1, tbl.shape[1]), mode="clip",
    ).reshape(rows.shape[0], tbl.shape[1])

def v0_current(tbl, rows, w4):
    g = gather_rows(tbl, rows).reshape(1, LQ, LP, 4, D)
    return jnp.einsum("bqkc,bqkcd->bqd", w4[None], g)

def v1_lane_slices(tbl, rows, w4):
    g = gather_rows(tbl, rows)                      # [R, 4D]
    wf = w4.reshape(R, 4)
    acc = jnp.zeros((R, D), jnp.bfloat16)
    for c in range(4):
        acc = acc + wf[:, c:c+1] * g[:, c*D:(c+1)*D]
    # reduce over LP samples: [R, D] -> [LQ, LP, D] -> sum
    return acc.reshape(1, LQ, LP, D).sum(axis=2)

def v1b_reduce_window(tbl, rows, w4):
    g = gather_rows(tbl, rows)
    wf = w4.reshape(R, 4)
    acc = jnp.zeros((R, D), jnp.float32)
    for c in range(4):
        acc = acc + (wf[:, c:c+1] * g[:, c*D:(c+1)*D]).astype(jnp.float32)
    red = jax.lax.reduce_window(
        acc, 0.0, jax.lax.add, (LP, 1), (LP, 1), "VALID"
    )
    return red[None]

def v2_wrep(tbl, rows, w4):
    # single elementwise multiply with lane-repeated weights, then strided sum
    g = gather_rows(tbl, rows)                      # [R, 4D]
    wrep = jnp.repeat(w4.reshape(R, 4), D, axis=1)  # [R, 4D]
    t = g * wrep
    acc = t[:, :D] + t[:, D:2*D] + t[:, 2*D:3*D] + t[:, 3*D:]
    return acc.reshape(1, LQ, LP, D).sum(axis=2)

# padded-to-256 table: corners at 64-aligned slots
tbl256 = jnp.zeros((S, 256), jnp.bfloat16)
for c in range(4):
    tbl256 = tbl256.at[:, c*64:c*64+D].set(tbl[:, c*D:(c+1)*D])

def v3_aligned(tbl256, rows, w4):
    g = gather_rows(tbl256, rows)                   # [R, 256]
    wf = w4.reshape(R, 4)
    acc = jnp.zeros((R, D), jnp.bfloat16)
    for c in range(4):
        acc = acc + wf[:, c:c+1] * g[:, c*64:c*64+D]
    return acc.reshape(1, LQ, LP, D).sum(axis=2)

K = 8
def bench(name, fn, *args):
    run = jax.jit(lambda *a: jax.lax.scan(
        lambda carry, _: (carry + jnp.sum(fn(*a).astype(jnp.float32)), ()),
        jnp.float32(0), None, length=K)[0])
    t0 = time.perf_counter(); float(run(*args)); ct = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run(*args)); dt = (time.perf_counter() - t0) / K
    print(f"{name:28s} {dt*1e3:7.2f} ms   (compile {ct:.0f}s)", flush=True)

ref = v0_current(tbl, rows, w4)
for name, fn, a in [
    ("v0 current (reshape+einsum)", v0_current, (tbl, rows, w4)),
    ("v1 lane-slices", v1_lane_slices, (tbl, rows, w4)),
    ("v1b lane-slices+reduce_win", v1b_reduce_window, (tbl, rows, w4)),
    ("v2 wrep multiply", v2_wrep, (tbl, rows, w4)),
    ("v3 aligned-256 table", v3_aligned, (tbl256, rows, w4)),
]:
    out = fn(*a)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    bench(name, fn, *a)
    print(f"{'':28s} max|diff vs v0| = {err:.4f}")
