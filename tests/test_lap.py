import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from kinet_tpu.ops.lap import solve_lsap, solve_lsap_batch, solve_lsap_masked


def _opt_cost(cost, col4row):
    return sum(cost[i, j] for i, j in enumerate(col4row))


@pytest.mark.parametrize("n,m,seed", [(3, 3, 0), (5, 9, 1), (10, 10, 2), (20, 100, 3), (60, 300, 4)])
def test_matches_scipy_optimum(n, m, seed):
    rng = np.random.default_rng(seed)
    cost = rng.normal(size=(n, m)).astype(np.float32)
    ours = np.asarray(solve_lsap(jnp.asarray(cost)))
    rows, cols = linear_sum_assignment(cost)
    # permutation validity
    assert len(set(ours.tolist())) == n
    np.testing.assert_allclose(
        _opt_cost(cost, ours), cost[rows, cols].sum(), rtol=1e-5, atol=1e-5
    )


def test_integer_costs_with_ties():
    rng = np.random.default_rng(7)
    cost = rng.integers(0, 5, size=(8, 12)).astype(np.float32)
    ours = np.asarray(solve_lsap(jnp.asarray(cost)))
    rows, cols = linear_sum_assignment(cost)
    assert len(set(ours.tolist())) == 8
    assert _opt_cost(cost, ours) == cost[rows, cols].sum()


def test_batch_vmap():
    rng = np.random.default_rng(11)
    cost = rng.normal(size=(4, 6, 10)).astype(np.float32)
    ours = np.asarray(solve_lsap_batch(jnp.asarray(cost)))
    for b in range(4):
        rows, cols = linear_sum_assignment(cost[b])
        np.testing.assert_allclose(
            _opt_cost(cost[b], ours[b]), cost[b][rows, cols].sum(), rtol=1e-5
        )


def test_masked_rows():
    rng = np.random.default_rng(13)
    cost = rng.normal(size=(6, 10)).astype(np.float32)
    valid = np.array([True, True, True, False, False, False])
    out = np.asarray(solve_lsap_masked(jnp.asarray(cost), jnp.asarray(valid)))
    assert (out[3:] == -1).all()
    # the valid sub-problem must be optimal
    rows, cols = linear_sum_assignment(cost[:3])
    np.testing.assert_allclose(
        _opt_cost(cost[:3], out[:3]), cost[:3][rows, cols].sum(), rtol=1e-5
    )
    assert len(set(out[:3].tolist())) == 3
