import jax, jax.numpy as jnp
from kinet_tpu.config import load_config
from kinet_tpu.models.build import build_model
from kinet_tpu.structs import ImageBatch, Targets

cfg = load_config("train.yaml",
    named=["train_deformable", "train_tracking", "train_multi_frame"]
).replace(dataset="mot", dropout=0.0)
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

fwd = jax.jit(lambda p, ba, t_: jnp.sum(model.apply(p, ba, t_)["pred_boxes"]))
print("warmup:", float(fwd(params, batch, tg)), flush=True)
with jax.profiler.trace("/tmp/jaxtrace_full"):
    for _ in range(2):
        float(fwd(params, batch, tg))
print("trace done")
