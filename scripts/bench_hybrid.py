import glob, gzip, json, collections, re
import jax, jax.numpy as jnp
from kinet_tpu.ops.msda import ms_deform_attn_patch
from kinet_tpu.ops.pallas_msda import ms_deform_attn_hybrid

shapes = ((100,180),(50,90),(25,45),(13,23))
S = sum(h*w for h,w in shapes); M,D,P,L = 8,36,4,4
k = jax.random.PRNGKey(0)
value = jax.random.normal(k,(1,S,M,D),jnp.bfloat16)
loc = jax.random.uniform(k,(1,S,M,L,P,2),jnp.float32)
aw = jnp.full((1,S,M,L,P),1.0/(L*P),jnp.float32)

fp = jax.jit(lambda v,l_,a: jnp.sum(ms_deform_attn_patch(v, shapes, l_, a)))
fh = jax.jit(lambda v,l_,a: jnp.sum(ms_deform_attn_hybrid(v, shapes, l_, a, 6144)))
print("patch:", float(fp(value, loc, aw)), flush=True)
print("hybrid:", float(fh(value, loc, aw)), flush=True)

with jax.profiler.trace("/tmp/tr_patch"):
    for _ in range(2): float(fp(value, loc, aw))
with jax.profiler.trace("/tmp/tr_hybrid"):
    for _ in range(2): float(fh(value, loc, aw))

def analyze(path):
    f = sorted(glob.glob(path + "/plugins/profile/*/vm.trace.json.gz"))[-1]
    d = json.load(gzip.open(f))
    pids = {e["pid"]: e["args"].get("name","") for e in d["traceEvents"]
            if e.get("ph")=="M" and e.get("name")=="process_name"}
    tot = 0
    for e in d["traceEvents"]:
        if e.get("ph")=="X" and "dur" in e and "TPU" in pids.get(e.get("pid"),""):
            if e["name"].startswith("jit"):
                tot += e["dur"]
    return tot/2e3

print(f"patch device:  {analyze('/tmp/tr_patch'):8.2f} ms/call")
print(f"hybrid device: {analyze('/tmp/tr_hybrid'):8.2f} ms/call")
