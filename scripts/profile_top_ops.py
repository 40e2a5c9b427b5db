"""Top individual device ops of the flagship CACHED-path frame (perfetto
trace), to attribute the 'fusion'/'copy' buckets to model stages.

PROF_B / BENCH_H / BENCH_W override batch and resolution.
"""
import collections
import glob
import gzip
import json
import os
import sys

import jax
import jax.numpy as jnp

from kinet_tpu.config import load_config
from kinet_tpu.models.build import build_model
from kinet_tpu.structs import ImageBatch, Targets

cfg = load_config(
    "train.yaml", named=["train_deformable", "train_tracking", "train_multi_frame"]
).replace(dataset="mot", dropout=0.0)
for kv in sys.argv[1:]:
    k, v = kv.split("=")
    cfg = cfg.replace(**{k: json.loads(v)})
model, _, _ = build_model(cfg)
b = int(os.environ.get("PROF_B", "1"))
h = int(os.environ.get("BENCH_H", "800"))
w = int(os.environ.get("BENCH_W", "1440"))
t = int(cfg.max_track_queries)
img = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, 3), jnp.float32)
batch = ImageBatch(images=img.astype(jnp.bfloat16), pad_mask=jnp.zeros((b, h, w), bool))
tg = Targets.create(
    jnp.full((b, 1, 4), 0.5), jnp.zeros((b, 1), jnp.int32),
    jnp.zeros((b, 1), bool), num_track_queries=t, hidden_dim=int(cfg.hidden_dim),
)
tg = tg.replace(
    track_query_mask=jnp.broadcast_to(jnp.arange(t)[None] < 20, (b, t)),
    track_query_embeds=jnp.zeros((b, t, int(cfg.hidden_dim)), jnp.bfloat16),
    track_query_boxes=jnp.full((b, t, 4), 0.4),
)
params = jax.jit(model.init)(jax.random.PRNGKey(1), batch, tg)
params = jax.tree_util.tree_map(
    lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x,
    params,
)

first = jax.jit(
    lambda p, ba, t_: (
        lambda o: (o["frame_memory"], o["pos_cache"])
    )(model.apply(p, ba, t_))
)
mem, pc = first(params, batch, tg)
fwd = jax.jit(
    lambda p, ba, t_, m, pc_: jnp.sum(
        model.apply(p, ba, t_, prev_memory=m, pos_cache=pc_)["pred_boxes"]
    )
)
print("warmup:", float(fwd(params, batch, tg, mem, pc)), flush=True)
TRACE = "/tmp/jaxtrace_topops"
with jax.profiler.trace(TRACE):
    for _ in range(2):
        float(fwd(params, batch, tg, mem, pc))
print("trace done", flush=True)

files = sorted(glob.glob(TRACE + "/**/*.trace.json.gz", recursive=True))
ev = json.loads(gzip.open(files[-1]).read().decode())["traceEvents"]
agg = collections.Counter()
long_names = {}
for e in ev:
    if e.get("ph") != "X" or "dur" not in e:
        continue
    args = e.get("args", {})
    if not args or ("long_name" not in args and "name" not in args):
        continue
    name = e.get("name", "")
    agg[name] += e["dur"] / 1e3
    ln = args.get("long_name", "")
    if ln:
        long_names[name] = ln[:220]
total = sum(agg.values())
print(f"TOTAL {total / 2:.2f} ms/frame — top ops:")
for name, dur in agg.most_common(35):
    print(f"{dur / 2:8.3f} ms  {name}")
    if name in long_names:
        print(f"            {long_names[name]}")
