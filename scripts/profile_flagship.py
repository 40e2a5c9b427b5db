"""Bisect the flagship forward cost on TPU."""
import time, jax, jax.numpy as jnp

K = 4
def timeit(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(c, _):
            out = fn(*a)
            return c + jnp.sum(out.astype(jnp.float32)), ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return c
    t0=time.perf_counter(); float(run(*args)); ct=time.perf_counter()-t0
    t0=time.perf_counter(); float(run(*args)); dt=(time.perf_counter()-t0)/K
    print(f"{name:44s} {dt*1e3:8.1f} ms  (compile {ct:.0f}s)", flush=True)

from kinet_tpu.config import load_config
from kinet_tpu.models.build import build_model
from kinet_tpu.structs import ImageBatch, Targets

def bench_variant(name, cfg_over):
    cfg = load_config("train.yaml",
        named=["train_deformable", "train_tracking", "train_multi_frame"]
    ).replace(dataset="mot", dropout=0.0, **cfg_over)
    model, _, _ = build_model(cfg)
    b, h, w = 1, 800, 1440
    t = int(cfg.max_track_queries)
    img = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, 3), jnp.float32)
    batch = ImageBatch(images=img.astype(jnp.bfloat16), pad_mask=jnp.zeros((b,h,w), bool))
    tg = Targets.create(jnp.full((b,1,4), .5), jnp.zeros((b,1), jnp.int32),
                        jnp.zeros((b,1), bool), num_track_queries=t,
                        hidden_dim=int(cfg.hidden_dim))
    tg = tg.replace(track_query_mask=jnp.arange(t)[None] < 20,
                    track_query_embeds=jnp.zeros((b, t, int(cfg.hidden_dim)), jnp.bfloat16),
                    track_query_boxes=jnp.full((b, t, 4), .4))
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch, tg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    timeit(name, lambda p, ba, t_: model.apply(p, ba, t_)["pred_boxes"], params, batch, tg)

import sys
which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "a"):
    bench_variant("flagship full (multi-frame)", {})
if which in ("all", "b"):
    bench_variant("single-frame (no multi-frame)", {"multi_frame_attention": False})
if which in ("all", "c"):
    bench_variant("multi-frame, enc_layers=1", {"enc_layers": 1})
if which in ("all", "d"):
    bench_variant("multi-frame, dec_layers=1", {"dec_layers": 1})
