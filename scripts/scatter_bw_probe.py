"""XLA TPU scatter-add probe: the MSDA backward cost model.
Compares plain scatter-add, sorted-indices scatter, and argsort+segment_sum
at flagship backward scale (768k rows of [1,144] into a 24k-row table)."""
import time

import jax
import jax.numpy as jnp

K = 8
S, R, C = 24_000, 768_000, 144


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
    print(f"{name:46s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    k = jax.random.PRNGKey(0)
    dg = jax.random.normal(k, (R, C), jnp.float32)
    idx = jax.random.randint(k, (R,), 0, S).astype(jnp.int32)
    idx_sorted = jnp.sort(idx)

    def scatter_add(dg_, idx_):
        return jnp.zeros((S, C), jnp.float32).at[idx_].add(dg_)

    def scatter_add_sorted(dg_, idx_):
        return jnp.zeros((S, C), jnp.float32).at[idx_].add(
            dg_, indices_are_sorted=True
        )

    def sort_then_segsum(dg_, idx_):
        order = jnp.argsort(idx_)
        return jax.ops.segment_sum(
            dg_[order], idx_[order], num_segments=S, indices_are_sorted=True
        )

    timeit("scatter-add random idx", scatter_add, dg, idx)
    timeit("scatter-add sorted idx (+hint)", scatter_add_sorted, dg, idx_sorted)
    timeit("argsort + gather + segment_sum", sort_then_segsum, dg, idx)
    # bf16 payload variant
    timeit(
        "scatter-add random idx bf16",
        scatter_add, dg.astype(jnp.bfloat16), idx,
    )


if __name__ == "__main__":
    main()
