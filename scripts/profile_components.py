"""Component-level timing on the real TPU using the scan-inside-jit trick
(axon's block_until_ready is unreliable; a K-iteration lax.scan inside one
jit gives honest device time per iteration).

NOTE: all tensors must be passed as jit ARGUMENTS — closing over them bakes
them in as constants and XLA constant-folding makes compiles explode."""
import sys
import time

import jax
import jax.numpy as jnp

K = 8


def timeit(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(c, _):
            out = fn(*a)
            s = sum(
                jnp.sum(jnp.asarray(o, jnp.float32))
                for o in jax.tree_util.tree_leaves(out)
            )
            return c + s, ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return c

    t0 = time.perf_counter()
    r = float(run(*args))
    compile_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = float(run(*args))
    dt = (time.perf_counter() - t0) / K
    print(f"{name:42s} {dt*1e3:9.2f} ms/iter  (compile+1st {compile_t:.0f}s)",
          flush=True)
    return dt


def main():
    from kinet_tpu.models.backbone import Backbone
    from kinet_tpu.ops.msda import ms_deform_attn

    B, H, W = 1, 800, 1440
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "backbone"):
        bb = Backbone(name_arch="resnet50", return_interm_layers=True)
        img = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, 3), jnp.float32)
        pad = jnp.zeros((B, H, W), bool)
        params = jax.jit(bb.init)(jax.random.PRNGKey(0), img, pad)
        timeit("resnet50 fp32 800x1440",
               lambda p, i, m: bb.apply(p, i, m), params, img, pad)
        img16 = img.astype(jnp.bfloat16)
        p16 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
        timeit("resnet50 bf16 800x1440",
               lambda p, i, m: bb.apply(p, i, m), p16, img16, pad)

    if which in ("all", "msda"):
        shapes = ((100, 180), (50, 90), (25, 45), (13, 23))
        S = sum(h * w for h, w in shapes)
        M, D, P, L = 8, 36, 4, len(shapes)
        k = jax.random.PRNGKey(0)
        value = jax.random.normal(k, (B, S, M, D), jnp.float32)
        loc = jax.random.uniform(k, (B, S, M, L, P, 2), jnp.float32)
        aw = jnp.full((B, S, M, L, P), 1.0 / (L * P), jnp.float32)
        timeit(f"msda enc fp32 S={S} L={L}",
               lambda v, l_, a: ms_deform_attn(v, shapes, l_, a),
               value, loc, aw)
        timeit(f"msda enc bf16 S={S} L={L}",
               lambda v, l_, a: ms_deform_attn(v, shapes, l_, a),
               value.astype(jnp.bfloat16), loc, aw)
        Lq = 600
        locd = jax.random.uniform(k, (B, Lq, M, L, P, 2), jnp.float32)
        awd = jnp.full((B, Lq, M, L, P), 1.0 / (L * P), jnp.float32)
        timeit(f"msda dec fp32 Lq={Lq}",
               lambda v, l_, a: ms_deform_attn(v, shapes, l_, a),
               value, locd, awd)

    if which in ("all", "encoder"):
        from kinet_tpu.models.deformable_transformer import DeformableEncoder

        shapes4 = ((100, 180), (50, 90), (25, 45), (13, 23))
        S4 = sum(h * w for h, w in shapes4)
        enc = DeformableEncoder(1, 288, 1024, 0.0, "relu", 4, 8, 4)
        src = jax.random.normal(jax.random.PRNGKey(0), (B, S4, 288), jnp.float32)
        pos = jnp.zeros_like(src)
        vr = jnp.ones((B, 4, 2), jnp.float32)
        pad = jnp.zeros((B, S4), bool)
        params = jax.jit(
            lambda k_: enc.init(k_, src, shapes4, vr, pos, pad)
        )(jax.random.PRNGKey(0))
        timeit(f"1 enc layer fp32 S={S4} L=4",
               lambda p, s, v, po, pa: enc.apply(p, s, shapes4, v, po, pa),
               params, src, vr, pos, pad)


if __name__ == "__main__":
    main()
