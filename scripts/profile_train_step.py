"""Profile one flagship train step on the real chip; categorize op time
(is the MSDA backward scatter-add the dominator?)."""
import collections
import glob
import gzip
import json

import jax
import jax.numpy as jnp

from kinet_tpu.config import load_config
from kinet_tpu.engine.state import TrainState, build_optimizer
from kinet_tpu.engine.train_step import make_train_step
from kinet_tpu.models.build import build_model
from kinet_tpu.structs import ImageBatch, Targets

cfg = load_config(
    "train.yaml", named=["train_deformable", "train_tracking", "train_multi_frame"]
).replace(dataset="mot", compute_dtype="bfloat16", remat=True)
model, criterion, _ = build_model(cfg)
b, h, w, n = 1, 672, 1184, 20
t = int(cfg.max_track_queries)


def make(k):
    img = jax.random.normal(k, (b, h, w, 3), jnp.float32)
    boxes = jax.random.uniform(k, (b, n, 4), minval=0.2, maxval=0.6)
    tids = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
    tg = Targets.create(
        boxes, jnp.zeros((b, n), jnp.int32), jnp.ones((b, n), bool),
        track_ids=tids, num_track_queries=t, hidden_dim=int(cfg.hidden_dim),
    )
    return ImageBatch(images=img, pad_mask=jnp.zeros((b, h, w), bool)), tg


batch, tg = make(jax.random.PRNGKey(0))
pb, ptg = make(jax.random.PRNGKey(1))
params = jax.jit(model.init)(jax.random.PRNGKey(2), batch, tg)
tx = build_optimizer(cfg, params, steps_per_epoch=100)
state = TrainState.create(params, tx)
step = make_train_step(model, criterion, tx, cfg)
state, losses = step(state, jax.random.PRNGKey(3), batch, tg, pb, ptg)
print("warm loss:", float(losses["loss"]), flush=True)

TRACE = "/tmp/jaxtrace_train"
with jax.profiler.trace(TRACE):
    state, losses = step(state, jax.random.PRNGKey(3), batch, tg, pb, ptg)
    print("traced loss:", float(losses["loss"]), flush=True)

files = sorted(glob.glob(TRACE + "/**/*.trace.json.gz", recursive=True))
ev = json.loads(gzip.open(files[-1]).read().decode())["traceEvents"]
cat = collections.Counter()
total = 0.0
for e in ev:
    if e.get("ph") != "X" or "dur" not in e:
        continue
    name = e.get("name", "")
    args = e.get("args", {})
    if not args or ("long_name" not in args and "name" not in args):
        continue
    dur = e["dur"] / 1e3
    n0 = name.split(".")[0].split("_")[0]
    key = (
        "scatter" if "scatter" in name
        else "gather" if "gather" in name
        else "sort" if "sort" in name
        else "conv/dot" if "conv" in name or "dot" in name
        else "fusion" if "fusion" in name
        else "copy" if "copy" in name or "transpose" in name
        else n0
    )
    cat[key] += dur
    total += dur
for k, v in cat.most_common(12):
    print(f"{k:24s} {v:8.1f} ms")
print(f"{'TOTAL':24s} {total:8.1f} ms (one step)")
