"""Compare weighted-reduction formulations after the patch gather."""
import glob, gzip, json
import jax, jax.numpy as jnp

B,M,Lq,P,D = 1,8,23924,4,36
k = jax.random.PRNGKey(0)
g = jax.random.normal(k, (B,M,Lq,P,2,2,D), jnp.bfloat16)
w = jax.random.uniform(k, (B,M,Lq,P,2,2), jnp.float32)

f_einsum = jax.jit(lambda w_, g_: jnp.sum(jnp.einsum("bmqpyx,bmqpyxd->bmqd", w_.astype(g_.dtype), g_)))
f_mulsum = jax.jit(lambda w_, g_: jnp.sum((w_.astype(g_.dtype)[..., None] * g_).sum((3,4,5))))
def dotg(w_, g_):
    wr = w_.reshape(B,M,Lq,P*4).astype(g_.dtype)
    gr = g_.reshape(B,M,Lq,P*4,D)
    return jnp.sum(jax.lax.dot_general(wr, gr, (((3,), (3,)), ((0,1,2), (0,1,2))), preferred_element_type=jnp.float32))
f_dot = jax.jit(dotg)

for name, f in [("einsum", f_einsum), ("mulsum", f_mulsum), ("dotgen", f_dot)]:
    print(name, float(f(w, g)), flush=True)
    with jax.profiler.trace(f"/tmp/tr_red_{name}"):
        for _ in range(3): float(f(w, g))
    fpath = sorted(glob.glob(f"/tmp/tr_red_{name}/plugins/profile/*/vm.trace.json.gz"))[-1]
    d = json.load(gzip.open(fpath))
    pids = {e["pid"]: e["args"].get("name","") for e in d["traceEvents"] if e.get("ph")=="M" and e.get("name")=="process_name"}
    tot = sum(e["dur"] for e in d["traceEvents"] if e.get("ph")=="X" and "dur" in e and "TPU" in pids.get(e.get("pid"),"") and e["name"].startswith("jit"))
    print(f"  {name}: {tot/3e3:.2f} ms/call", flush=True)
