"""Raw XLA TPU gather bandwidth probe: time [2,2,C]-slice patch gathers at
constant total bytes while varying bytes-per-row, plus flat-row variants.
Decides how many heads should share one sampling location (loc groups)."""
import time

import jax
import jax.numpy as jnp

K = 8
H, W = 100, 180
TOTAL_C = 288  # full hidden dim (8 heads x 36)
R_BASE = 768_000  # rows at C=36 (flagship per-level encoder load)


def timeit(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(c, _):
            perturbed = (a[0] * (1 + c * 1e-12),) + a[1:]
            return c + jnp.sum(fn(*perturbed).astype(jnp.float32)), ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return c

    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    dt = (time.perf_counter() - t0) / K
    print(f"{name:44s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def patch_gather(c):
    d = c
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )

    def fn(v, idx):
        return jax.lax.gather(v, idx, dnums, slice_sizes=(2, 2, d), mode="clip")

    return fn


def main():
    k = jax.random.PRNGKey(0)
    for c in (36, 72, 144, 288):
        rows = R_BASE * 36 // c
        v = jax.random.normal(k, (H, W, c), jnp.bfloat16)
        idx = jax.random.randint(k, (rows, 2), 0, 90).astype(jnp.int32)
        dt = timeit(
            f"patch [2,2,{c}] x {rows} rows (same bytes)",
            patch_gather(c), v, idx,
        )
        gb = rows * 4 * c * 2 / 1e9
        print(f"   -> {gb / dt:6.1f} GB/s eff")
    # flat single-row gathers [1, C]
    for c in (144, 288, 576, 1152):
        rows = R_BASE * 144 // c
        v = jax.random.normal(k, (H * W, c), jnp.bfloat16)
        idx = jax.random.randint(k, (rows, 1), 0, H * W - 1).astype(jnp.int32)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
        )

        def fn(v_, i_):
            return jax.lax.gather(
                v_, i_, dnums, slice_sizes=(1, c), mode="clip"
            )

        dt = timeit(f"flat [1,{c}] x {rows} rows (same bytes)", fn, v, idx)
        gb = rows * c * 2 / 1e9
        print(f"   -> {gb / dt:6.1f} GB/s eff")


def table_size_sweep():
    """Where is the fast-gather cliff? flat [1,144] x 768k rows from tables
    of increasing row count (probe tables were small enough to cache)."""
    k = jax.random.PRNGKey(0)
    c, rows = 144, 768_000
    for n in (18_000, 36_000, 72_000, 144_000, 288_000, 576_000):
        v = jax.random.normal(k, (n, c), jnp.bfloat16)
        idx = jax.random.randint(k, (rows, 1), 0, n - 1).astype(jnp.int32)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
        )

        def fn(v_, i_):
            return jax.lax.gather(
                v_, i_, dnums, slice_sizes=(1, c), mode="clip"
            )

        dt = timeit(f"flat [1,{c}] x {rows} from [{n},{c}] ({n*c*2//2**20}MB)", fn, v, idx)
        gb = rows * c * 2 / 1e9
        print(f"   -> {gb / dt:6.1f} GB/s eff")


if __name__ == "__main__":
    import sys
    if "--sweep" in sys.argv:
        table_size_sweep()
    else:
        main()
