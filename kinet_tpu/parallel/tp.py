"""Tensor-parallel parameter shardings over the mesh's `model` axis.

The reference scales with data-parallel DDP only (SURVEY §2.6); at larger
scales a v5e pod wants the transformer's weight matrices split over ICI
too. With GSPMD that is a LAYOUT decision, not a rewrite: annotate the
parameters with Megatron-style PartitionSpecs and jit — XLA propagates
the shardings through the graph and inserts the all-reduces.

Rules (per module dict holding a `kernel`):
- 2-D Dense [in, out]: column-parallel P(None, 'model') when the OUTPUT
  dim divides (bias P('model')); else row-parallel P('model', None) when
  the input dim divides (bias replicated — the matmul psum restores the
  full activation). FFN pairs thus become the classic
  column-then-row-parallel pattern with the hidden activation sharded
  between them.
- MHA DenseGeneral: query/key/value kernels [d, heads, hd] shard heads
  P(None, 'model', None); the out kernel [heads, hd, d] is row-parallel
  P('model', None, None).
- Conv [kh, kw, in, out]: shard the output channels when they divide.
- everything else (norms, embeddings, small heads): replicated.

Math is unchanged for every choice — shardings only place data.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _module_specs(name_path, node, n_model):
    """Specs for one {kernel[, bias]} module dict."""
    k = node["kernel"]
    parent = name_path[-1] if name_path else ""
    kernel = P()
    bias = P()
    if k.ndim == 2:
        i, o = k.shape
        if o % n_model == 0 and o >= i:
            kernel, bias = P(None, "model"), P("model")
        elif i % n_model == 0:
            kernel = P("model", None)
    elif k.ndim == 3:
        if parent in ("query", "key", "value") and k.shape[1] % n_model == 0:
            kernel, bias = P(None, "model", None), P("model", None)
        elif parent == "out" and k.shape[0] % n_model == 0:
            kernel = P("model", None, None)
    elif k.ndim == 4 and k.shape[3] % n_model == 0:
        kernel, bias = P(None, None, None, "model"), P("model")
    out = {"kernel": kernel}
    if "bias" in node:
        out["bias"] = bias
    # any extra leaves in the module (rare) stay replicated
    for key in node:
        if key not in out:
            out[key] = P()
    return out


def tp_partition_specs(params, n_model: int):
    """PartitionSpec pytree matching `params` (a flax param dict)."""

    def walk(path, node):
        if isinstance(node, dict):
            if "kernel" in node and hasattr(node["kernel"], "ndim"):
                return _module_specs(path, node, n_model)
            return {k: walk(path + (k,), v) for k, v in node.items()}
        return P()

    if n_model <= 1:
        return jax.tree_util.tree_map(lambda _: P(), params)
    return walk((), params)


def shard_params_tp(params, mesh: Mesh):
    """Place params with TP shardings over mesh ('data' replicated).

    Shard BEFORE building the optimizer / TrainState: optax moments are
    created with zeros_like over the (already sharded) params, so mu/nu
    inherit the same shardings with no extra plumbing."""
    n_model = mesh.shape["model"]
    specs = tp_partition_specs(params, n_model)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
