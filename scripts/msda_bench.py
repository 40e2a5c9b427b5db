import time, jax, jax.numpy as jnp
from kinet_tpu.ops.msda import ms_deform_attn, ms_deform_attn_scan
K = 8
def timeit(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(c, _):
            return c + jnp.sum(fn(*a)), ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return c
    t0=time.perf_counter(); r=float(run(*args)); ct=time.perf_counter()-t0
    t0=time.perf_counter(); r=float(run(*args)); dt=(time.perf_counter()-t0)/K
    print(f"{name:34s} {dt*1e3:8.2f} ms  (compile {ct:.0f}s)", flush=True)

shapes = ((100,180),(50,90),(25,45),(13,23))
S = sum(h*w for h,w in shapes); M,D,P,L = 8,36,4,4
k = jax.random.PRNGKey(0)
value = jax.random.normal(k,(1,S,M,D),jnp.float32)
loc = jax.random.uniform(k,(1,S,M,L,P,2),jnp.float32)
aw = jnp.full((1,S,M,L,P),1.0/(L*P),jnp.float32)
timeit("NEW slice-gather fp32 enc", lambda v,l_,a: ms_deform_attn(v,shapes,l_,a), value, loc, aw)
timeit("NEW slice-gather bf16 enc", lambda v,l_,a: ms_deform_attn(v,shapes,l_,a), value.astype(jnp.bfloat16), loc, aw)
timeit("scan fp32 enc", lambda v,l_,a: ms_deform_attn_scan(v,shapes,l_,a), value, loc, aw)

from kinet_tpu.ops.msda import ms_deform_attn_patch
timeit("PATCH 2x2 fp32 enc", lambda v,l_,a: ms_deform_attn_patch(v,shapes,l_,a), value, loc, aw)
timeit("PATCH 2x2 bf16 enc", lambda v,l_,a: ms_deform_attn_patch(v,shapes,l_,a), value.astype(jnp.bfloat16), loc, aw)
