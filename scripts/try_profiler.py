import jax, jax.numpy as jnp, os, time
from kinet_tpu.ops.msda import ms_deform_attn_patch
shapes = ((100,180),(50,90),(25,45),(13,23))
S = sum(h*w for h,w in shapes); M,D,P,L = 8,36,4,4
k = jax.random.PRNGKey(0)
value = jax.random.normal(k,(1,S,M,D),jnp.bfloat16)
loc = jax.random.uniform(k,(1,S,M,L,P,2),jnp.float32)
aw = jnp.full((1,S,M,L,P),1.0/(L*P),jnp.float32)
f = jax.jit(lambda v,l_,a: jnp.sum(ms_deform_attn_patch(v, shapes, l_, a)))
print("warmup:", float(f(value, loc, aw)))
try:
    with jax.profiler.trace("/tmp/jaxtrace"):
        for _ in range(3):
            r = float(f(value, loc, aw))
    print("trace ok")
except Exception as e:
    print("trace failed:", type(e).__name__, str(e)[:200])
