import time, sys
import jax, jax.numpy as jnp

B, S, M, D = 1, 23924, 8, 36
k = jax.random.PRNGKey(0)
value = jax.random.normal(k, (B, M, S, D), jnp.float32)
idx = jax.random.randint(k, (B, M, S), 0, S)

def probe(name, fn, *args):
    t0=time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t1=time.perf_counter()
    compiled = lowered.compile()
    t2=time.perf_counter()
    out = compiled(*args); jax.block_until_ready(out)
    print(f"{name}: lower {t1-t0:.1f}s compile {t2-t1:.1f}s", flush=True)

probe("take_along_axis [B,M,S,D] axis=2",
      lambda v, i: jnp.take_along_axis(v, i[..., None], axis=2), value, idx)

def scan16(v, i):
    def body(acc, _):
        g = jnp.take_along_axis(v, i[..., None], axis=2)
        return acc + g, None
    acc, _ = jax.lax.scan(body, jnp.zeros_like(v), None, length=16)
    return acc
probe("scan(16) of gather", scan16, value, idx)

def flat_take(v, i):
    tbl = v.reshape(B*M*S, D)
    off = (jnp.arange(B*M)[:, None] * S + i.reshape(B*M, S)).reshape(-1)
    return jnp.take(tbl, off, axis=0).reshape(B, M, S, D)
probe("flat take axis0", flat_take, value, idx)
