"""Probe tpu.dynamic_gather throughput inside a Pallas kernel."""
import time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 8192, 128

def kernel(tbl_ref, idx_ref, out_ref):
    # take_along_axis along axis 0 with same-shape idx lowers to dynamic_gather
    out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=0)

@jax.jit
def run(tbl, idx):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, C), tbl.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tbl, idx)

k = jax.random.PRNGKey(0)
tbl = jax.random.normal(k, (R, C), jnp.float32)
idx = jax.random.randint(k, (R, C), 0, R, jnp.int32)

K = 32
@jax.jit
def loop(tbl, idx):
    def body(c, _):
        return c + jnp.sum(run(tbl, idx)), ()
    c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
    return c

t0=time.perf_counter(); print("out sum:", float(loop(tbl, idx))); print("compile", time.perf_counter()-t0, flush=True)
t0=time.perf_counter(); float(loop(tbl, idx)); dt=(time.perf_counter()-t0)/K
bytes_moved = R*C*4*2
print(f"dynamic_gather {R}x{C}: {dt*1e6:.0f} us/op  -> {bytes_moved/dt/1e9:.1f} GB/s")
