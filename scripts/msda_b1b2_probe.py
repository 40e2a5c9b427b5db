"""A/B probe for the batch-dim MSDA restructure: times the two production
formulations (quad_unroll = encoder, raw_pool = decoder) at B=1 and B=2,
flagship 800x1440 shapes. Run once on each git state to compare.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/msda_b1b2_probe.py
"""
import time

import jax
import jax.numpy as jnp

from kinet_tpu.ops.msda import (
    build_raw_quad,
    ms_deform_attn_quad_unroll,
    ms_deform_attn_raw_pool,
)

K = 8
shapes = ((100, 180), (50, 90), (25, 45), (13, 23))
S = sum(h * w for h, w in shapes)
M, D, P, L = 8, 32, 4, len(shapes)
C = M * D


def timeit(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(c, _):
            r = fn(*a)
            leaf = r[0] if isinstance(r, tuple) else r
            return c + jnp.sum(leaf), ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return c

    t0 = time.perf_counter(); float(run(*args)); ct = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(run(*args))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:40s} {best * 1e3:8.2f} ms  (compile {ct:.0f}s)", flush=True)


for B in (1, 2):
    k = jax.random.PRNGKey(0)
    value = jax.random.normal(k, (B, S, M, D), jnp.bfloat16)
    # encoder: Lq = S (self-attn over all positions)
    loc = jax.random.uniform(k, (B, S, M, L, P, 2), jnp.float32)
    aw = jnp.full((B, S, M, L, P), 1.0 / (L * P), jnp.float32)
    timeit(
        f"quad_unroll enc B={B}",
        lambda v, l_, a: ms_deform_attn_quad_unroll(v, shapes, l_, a),
        value, loc, aw,
    )
    # decoder: Lq small (500 queries), raw-pool path
    lq = 512
    src = jax.random.normal(k, (B, S, C), jnp.bfloat16)
    quad = build_raw_quad(src, shapes)
    dloc = jax.random.uniform(k, (B, lq, M, L, P, 2), jnp.float32)
    daw = jnp.full((B, lq, M, L, P), 1.0 / (L * P), jnp.float32)
    timeit(
        f"raw_pool dec B={B}",
        lambda sr, q, l_, a: ms_deform_attn_raw_pool(
            sr, shapes, l_, a, src_quad=q
        ),
        src, quad, dloc, daw,
    )
