"""On-device linear sum assignment (Hungarian / Jonker-Volgenant).

The reference calls `scipy.optimize.linear_sum_assignment` on host every
training step (reference: src/trackformer/models/matcher.py:198,
detr.py:833), forcing a device->host sync. Here the shortest-augmenting-path
LSAP algorithm (the same one scipy implements) is expressed with
`lax.while_loop`/`lax.fori_loop` so matching runs on-device, inside the
jitted train step, and vmaps over the batch.

Shapes are static: cost is [N, M] with N <= M required (N = targets,
M = queries in DETR matching). Invalid (padded) rows must carry a finite
uniform cost so the problem stays feasible; callers mask the result.

Returns col4row[int32, N]: for each row, the assigned column. The solution
is an exact optimum (ties may resolve differently than scipy's).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_INF = jnp.float32(jnp.inf)


def _augmenting_path_step(cost, u, v, row4col, state):
    """One Dijkstra step: scan row i, relax all unvisited columns."""
    i, min_val, sr, sc, spc, path, sink = state
    n, m = cost.shape
    sr = sr.at[i].set(True)
    reduced = min_val + cost[i, :] - u[i] - v  # (m,)
    better = (reduced < spc) & (~sc)
    spc = jnp.where(better, reduced, spc)
    path = jnp.where(better, i, path)
    # pick the lowest-cost unvisited column; prefer unassigned on ties
    key = jnp.where(sc, _INF, spc)
    lowest = jnp.min(key)
    cand = key == lowest
    unassigned_cand = cand & (row4col == -1)
    j = jnp.where(
        jnp.any(unassigned_cand),
        jnp.argmax(unassigned_cand),
        jnp.argmax(cand),
    ).astype(jnp.int32)
    min_val = lowest
    j_unassigned = row4col[j] == -1
    sink = jnp.where(j_unassigned, j, jnp.int32(-1))
    i = jnp.where(j_unassigned, i, row4col[j])
    sc = sc.at[j].set(True)
    return i, min_val, sr, sc, spc, path, sink


def _solve_row(cost, cur_row, carry):
    """Find an augmenting path for cur_row, update duals, flip the path."""
    u, v, col4row, row4col = carry
    n, m = cost.shape

    init = (
        cur_row,  # i
        jnp.float32(0.0),  # min_val
        jnp.zeros((n,), bool),  # SR: rows on the alternating tree
        jnp.zeros((m,), bool),  # SC: visited columns
        jnp.full((m,), _INF),  # shortest path costs
        jnp.full((m,), -1, jnp.int32),  # path: predecessor row per column
        jnp.int32(-1),  # sink
    )
    state = lax.while_loop(
        lambda s: s[-1] < 0,
        lambda s: _augmenting_path_step(cost, u, v, row4col, s),
        init,
    )
    _, min_val, sr, sc, spc, path, sink = state

    # dual updates (scipy rectangular_lsap.cpp semantics)
    u = u.at[cur_row].add(min_val)
    rows = jnp.arange(n)
    others = sr & (rows != cur_row)
    # rows in SR other than cur_row are assigned; their column is col4row[i]
    safe_cols = jnp.clip(col4row, 0, m - 1)
    u = jnp.where(others, u + min_val - spc[safe_cols], u)
    v = jnp.where(sc, v + spc - min_val, v)

    # augment: walk predecessors from sink back to cur_row
    def aug_body(s):
        j, col4row, row4col, _ = s
        i = path[j]
        row4col = row4col.at[j].set(i)
        next_j = col4row[i]
        col4row = col4row.at[i].set(j)
        return next_j, col4row, row4col, i == cur_row

    _, col4row, row4col, _ = lax.while_loop(
        lambda s: ~s[-1],
        aug_body,
        (sink, col4row, row4col, jnp.bool_(False)),
    )
    return u, v, col4row, row4col


@functools.partial(jax.jit, static_argnames=())
def solve_lsap(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact LSAP on a single [N, M] cost matrix, N <= M. Returns col4row [N]."""
    n, m = cost.shape
    if n > m:
        raise ValueError(f"solve_lsap requires N <= M, got {cost.shape}")
    cost = cost.astype(jnp.float32)
    u = jnp.zeros((n,), jnp.float32)
    v = jnp.zeros((m,), jnp.float32)
    col4row = jnp.full((n,), -1, jnp.int32)
    row4col = jnp.full((m,), -1, jnp.int32)

    def body(r, carry):
        return _solve_row(cost, r, carry)

    _, _, col4row, _ = lax.fori_loop(0, n, body, (u, v, col4row, row4col))
    return col4row


def solve_lsap_batch(cost: jnp.ndarray) -> jnp.ndarray:
    """vmapped LSAP over a [B, N, M] batch. Returns [B, N] col indices."""
    return jax.vmap(solve_lsap)(cost)


def solve_lsap_masked(
    cost: jnp.ndarray, row_valid: jnp.ndarray, pad_cost: float = 1e6
) -> jnp.ndarray:
    """LSAP where padded rows (row_valid == False) are neutralised.

    Padded rows get a flat `pad_cost` so they soak up leftover columns
    without influencing real rows. Result entries for invalid rows are -1.
    """
    cost = jnp.where(row_valid[..., :, None], cost, pad_cost)
    col4row = solve_lsap(cost) if cost.ndim == 2 else solve_lsap_batch(cost)
    return jnp.where(row_valid, col4row, -1)
