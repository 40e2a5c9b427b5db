"""Why does per-image train cost rise with batch (B1 5.5 / B4 4.9 img/s)?

Hypothesis (VERDICT r2 weak #2 asked for a profile note): the quad-table
gather rate is TABLE-SIZE tiered (gather_bw_probe.py: <=~20 MB tables
gather at ~31 GB/s, above ~14 GB/s). The per-head all-level quad table is
[B*S, 4D] — ~7 MB at flagship B1, 28 MB at B4 — so B4 gathers fall out of
the fast tier. If true, per-BATCH-ELEMENT unrolled gathers (B separate
gathers per head, each against a B1-sized table) should restore B1-rate
per-image cost at the price of B x more gather dispatches.

Axon rules: one K-iter lax.scan per timing, scalar fetch, same process.
"""
import time

import jax

# persistent compile cache: lets an interrupted probe resume — each case
# that finished compiling is instant on the next run
jax.config.update("jax_compilation_cache_dir", "/tmp/kinet_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from kinet_tpu.ops.msda import ms_deform_attn_quad_unroll

K = 4
# flagship encoder shapes at train max_size 666 (672x1184 padded): one
# frame's 4-level pyramid; encoder MSDA has Lq == S
SHAPES = ((84, 148), (42, 74), (21, 37), (11, 19))
S = sum(h * w for h, w in SHAPES)
M, D, L, P = 8, 36, 4, 2  # enc_n_points=2 (flagship surgery)


def timeit(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(c, _):
            return c + jnp.sum(fn(*a)), ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return c

    t0 = time.perf_counter()
    float(run(*args))
    ct = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:44s} {best * 1e3:8.2f} ms  (compile {ct:.0f}s)", flush=True)
    return best


def batched_op(v, l_, a):
    return ms_deform_attn_quad_unroll(v, SHAPES, l_, a)


def per_element_op(v, l_, a):
    outs = [
        ms_deform_attn_quad_unroll(
            v[i : i + 1], SHAPES, l_[i : i + 1], a[i : i + 1]
        )
        for i in range(v.shape[0])
    ]
    return jnp.concatenate(outs, axis=0)


def main():
    k = jax.random.PRNGKey(0)
    for b in (1, 4, 8):
        value = jax.random.normal(k, (b, S, M, D), jnp.bfloat16)
        loc = jax.random.uniform(k, (b, S, M, L, P, 2), jnp.float32)
        aw = jnp.full((b, S, M, L, P), 1.0 / (L * P), jnp.float32)
        tbl_mb = b * S * 4 * D * 2 / 1e6
        t_b = timeit(
            f"B{b} batched gather (table {tbl_mb:.0f} MB/head)",
            batched_op, value, loc, aw,
        )
        print(f"  -> per-image {t_b / b * 1e3:.2f} ms", flush=True)
        if b > 1:
            t_e = timeit(
                f"B{b} per-element gathers (table {tbl_mb / b:.0f} MB/head)",
                per_element_op, value, loc, aw,
            )
            print(f"  -> per-image {t_e / b * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
