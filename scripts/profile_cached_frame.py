"""Profile the flagship CACHED-path frame (prev_memory reuse) on the real
chip and print an op-category breakdown parsed from the perfetto trace."""
import collections
import glob
import gzip
import json

import jax
import jax.numpy as jnp

from kinet_tpu.config import load_config
from kinet_tpu.models.build import build_model
from kinet_tpu.structs import ImageBatch, Targets

cfg = load_config(
    "train.yaml", named=["train_deformable", "train_tracking", "train_multi_frame"]
).replace(dataset="mot", dropout=0.0)
import sys
for kv in sys.argv[1:]:
    k, v = kv.split("=")
    cfg = cfg.replace(**{k: json.loads(v)})
model, _, _ = build_model(cfg)
import os
b, h, w = int(os.environ.get("PROF_B", "1")), 800, 1440
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
TRACE = "/tmp/jaxtrace_cached"
with jax.profiler.trace(TRACE):
    for _ in range(2):
        float(fwd(params, batch, tg, mem, pc))
print("trace done", flush=True)

files = sorted(glob.glob(TRACE + "/**/*.trace.json.gz", recursive=True))
ev = json.loads(gzip.open(files[-1]).read().decode())["traceEvents"]
cat = collections.Counter()
total = 0.0
for e in ev:
    if e.get("ph") != "X" or "dur" not in e:
        continue
    pid_name = e.get("pid")
    name = e.get("name", "")
    args = e.get("args", {})
    # device op events carry 'run_id'/'correlation' style args on TPU; keep
    # XLA op events only (skip steps/host threads by name heuristics)
    if not args or "long_name" not in args and "name" not in args:
        continue
    dur = e["dur"] / 1e3  # ms
    n = name.split(".")[0].split("_")[0]
    key = (
        "gather" if "gather" in name
        else "scatter" if "scatter" in name
        else "conv" if "conv" in name or "dot" in name
        else "fusion" if "fusion" in name
        else "copy" if "copy" in name or "transpose" in name
        else "sort" if "sort" in name or "top-k" in name
        else n
    )
    cat[key] += dur
    total += dur
for k, v in cat.most_common(15):
    print(f"{k:24s} {v / 2:8.2f} ms")
print(f"{'TOTAL':24s} {total / 2:8.2f} ms (per frame)")
