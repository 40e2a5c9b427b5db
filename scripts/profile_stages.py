"""Stage-level timing of the flagship forward on TPU."""
import time, jax, jax.numpy as jnp

K = 4
def timeit(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(c, _):
            out = fn(*a)
            s = sum(jnp.sum(jnp.asarray(o, jnp.float32)) for o in jax.tree_util.tree_leaves(out))
            return c + s, ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return c
    t0=time.perf_counter(); float(run(*args)); ct=time.perf_counter()-t0
    t0=time.perf_counter(); float(run(*args)); dt=(time.perf_counter()-t0)/K
    print(f"{name:40s} {dt*1e3:8.2f} ms  (compile {ct:.0f}s)", flush=True)

from kinet_tpu.models.deformable_transformer import DeformableEncoder, DeformableDecoder

B = 1
shapes4 = ((100,180),(50,90),(25,45),(13,23))
S4 = sum(h*w for h,w in shapes4)
D = 288
k = jax.random.PRNGKey(0)

# 6-layer encoder at single-frame scale (the flagship runs TWO of these)
enc = DeformableEncoder(6, D, 1024, 0.0, "relu", 4, 8, 4)
src = jax.random.normal(k, (B, S4, D), jnp.float32)
pos = jnp.zeros_like(src)
vr = jnp.ones((B, 4, 2), jnp.float32)
pad = jnp.zeros((B, S4), bool)
params = jax.jit(lambda kk: enc.init(kk, src, shapes4, vr, pos, pad))(k)
p16 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
timeit("encoder 6L bf16 (x2 in flagship)",
       lambda p,s,v,po,pa: enc.apply(p, s, shapes4, v, po, pa), p16, src.astype(jnp.bfloat16), vr, pos.astype(jnp.bfloat16), pad)

# decoder: 8 levels (two frames), 600 queries, 6 layers
shapes8 = shapes4 * 2
S8 = S4 * 2
dec = DeformableDecoder(6, D, 1024, 0.0, "relu", 8, 8, 4)
mem = jax.random.normal(k, (B, S8, D), jnp.float32)
tgt = jax.random.normal(k, (B, 600, D), jnp.float32)
ref = jax.random.uniform(k, (B, 600, 2), jnp.float32)
qpos = jnp.zeros_like(tgt)
vr8 = jnp.ones((B, 8, 2), jnp.float32)
pad8 = jnp.zeros((B, S8), bool)
dparams = jax.jit(lambda kk: dec.init(kk, tgt, ref, mem, shapes8, vr8, qpos, pad8))(k)
dp16 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x, dparams)
timeit("decoder 6L bf16",
       lambda p,t,r,m,v,q,pa: dec.apply(p, t, r, m, shapes8, v, q, pa),
       dp16, tgt.astype(jnp.bfloat16), ref, mem.astype(jnp.bfloat16), vr8, qpos.astype(jnp.bfloat16), pad8)
