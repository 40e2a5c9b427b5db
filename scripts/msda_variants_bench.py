"""On-chip MSDA variant shootout at flagship encoder scale.

Methodology (verify skill rules): K iterations inside ONE jit via lax.scan,
inputs perturbed by the carry so XLA cannot hoist the op out of the loop;
params/batches passed as jit arguments; compare ratios within one process.
"""
import time

import jax
import jax.numpy as jnp

from kinet_tpu.ops.msda import (
    ms_deform_attn,
    ms_deform_attn_patch,
    ms_deform_attn_patch_shared,
    ms_deform_attn_quad,
    ms_deform_attn_quad_shared,
    ms_deform_attn_topk,
)

K = 8
# flagship encoder scale at 800x1440: strides 8/16/32/64
SHAPES = ((100, 180), (50, 90), (25, 45), (13, 23))
S = sum(h * w for h, w in SHAPES)
M, D, L, P = 8, 36, 4, 4
B = 1


def timeit(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(c, _):
            # perturb the first arg (value) by the carry: defeats hoisting
            perturbed = (a[0] * (1 + c * 1e-12),) + a[1:]
            return c + jnp.sum(fn(*perturbed)), ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return c

    t0 = time.perf_counter()
    float(run(*args))
    ct = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(*args))
    dt = (time.perf_counter() - t0) / K
    print(f"{name:40s} {dt * 1e3:8.2f} ms  (compile {ct:.0f}s)", flush=True)
    return dt


def main():
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    value = jax.random.normal(k1, (B, S, M, D), jnp.bfloat16)
    loc = jax.random.uniform(k2, (B, S, M, L, P, 2), jnp.float32)
    aw = jax.nn.softmax(
        jax.random.normal(k3, (B, S, M, L, P)).reshape(B, S, M, L * P)
    ).reshape(B, S, M, L, P)
    loc_shared = loc[:, :, 0]

    base = timeit(
        "patch per-head (production)",
        lambda v, l_, a: ms_deform_attn_patch(v, SHAPES, l_, a), value, loc, aw,
    )
    timeit(
        "row-pair per-head",
        lambda v, l_, a: ms_deform_attn(v, SHAPES, l_, a), value, loc, aw,
    )
    for kk in (8, 4):
        dt = timeit(
            f"topk k={kk}",
            lambda v, l_, a, kk=kk: ms_deform_attn_topk(
                v, SHAPES, l_, a, top_k=kk
            ),
            value, loc, aw,
        )
        print(f"  -> {base / dt:.2f}x vs patch")
    dt = timeit(
        "shared-locs",
        lambda v, l_, a: ms_deform_attn_patch_shared(v, SHAPES, l_, a),
        value, loc_shared, aw,
    )
    print(f"  -> {base / dt:.2f}x vs patch")
    dt = timeit(
        "QUAD flat-row (exact)",
        lambda v, l_, a: ms_deform_attn_quad(v, SHAPES, l_, a), value, loc, aw,
    )
    print(f"  -> {base / dt:.2f}x vs patch")
    dt = timeit(
        "QUAD shared-locs",
        lambda v, l_, a: ms_deform_attn_quad_shared(v, SHAPES, l_, a),
        value, loc_shared, aw,
    )
    print(f"  -> {base / dt:.2f}x vs patch")


if __name__ == "__main__" and False:
    main()


def extra():
    from kinet_tpu.ops.msda import (
        ms_deform_attn_quad_fold,
        ms_deform_attn_quad_shared_fold,
    )

    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    value = jax.random.normal(k1, (B, S, M, D), jnp.bfloat16)
    loc = jax.random.uniform(k2, (B, S, M, L, P, 2), jnp.float32)
    aw = jax.nn.softmax(
        jax.random.normal(k3, (B, S, M, L, P)).reshape(B, S, M, L * P)
    ).reshape(B, S, M, L, P)
    base = timeit(
        "patch per-head (production)",
        lambda v, l_, a: ms_deform_attn_patch(v, SHAPES, l_, a), value, loc, aw,
    )
    dt = timeit(
        "QUAD-FOLD (exact, no batch dims)",
        lambda v, l_, a: ms_deform_attn_quad_fold(v, SHAPES, l_, a),
        value, loc, aw,
    )
    print(f"  -> {base / dt:.2f}x vs patch")
    dt = timeit(
        "QUAD-FOLD shared-locs",
        lambda v, l_, a: ms_deform_attn_quad_shared_fold(v, SHAPES, l_, a),
        value, loc[:, :, 0], aw,
    )
    print(f"  -> {base / dt:.2f}x vs patch")



def extra2():
    from kinet_tpu.ops.msda import (
        ms_deform_attn_quad_unroll,
        ms_deform_attn_topk_quad,
    )

    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    value = jax.random.normal(k1, (B, S, M, D), jnp.bfloat16)
    loc = jax.random.uniform(k2, (B, S, M, L, P, 2), jnp.float32)
    aw = jax.nn.softmax(
        jax.random.normal(k3, (B, S, M, L, P)).reshape(B, S, M, L * P)
    ).reshape(B, S, M, L, P)
    base = timeit(
        "patch per-head (production)",
        lambda v, l_, a: ms_deform_attn_patch(v, SHAPES, l_, a), value, loc, aw,
    )
    dt = timeit(
        "QUAD-UNROLL per-head (exact)",
        lambda v, l_, a: ms_deform_attn_quad_unroll(v, SHAPES, l_, a),
        value, loc, aw,
    )
    print(f"  -> {base / dt:.2f}x vs patch")
    for kk in (8, 4):
        dt = timeit(
            f"TOPK-QUAD k={kk}",
            lambda v, l_, a, kk=kk: ms_deform_attn_topk_quad(
                v, SHAPES, l_, a, top_k=kk
            ),
            value, loc, aw,
        )
        print(f"  -> {base / dt:.2f}x vs patch")


if __name__ == "__main__":
    import sys
    if "--extra2" in sys.argv:
        extra2()
    elif "--extra" in sys.argv:
        extra()
    else:
        main()
