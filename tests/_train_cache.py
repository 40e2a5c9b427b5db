"""Cross-run cache for trained test-fixture params.

The two synthetic-MOTA gates spend ~8 min of suite wall-clock training
tiny models whose ONLY purpose is to exercise the tracker afterwards.
Re-running the suite on an UNCHANGED tree re-derives bit-identical
params, so those runs may reuse them — but any change to the package
sources or configs MUST retrain (a stale checkpoint would mask training
regressions). The cache key is therefore a fingerprint of every
kinet_tpu/cfgs source file plus the recipe description, the jax version
and the platform; `rm -rf /tmp/kinet_test_train_cache` forces retrain.
"""
from __future__ import annotations

import hashlib
import json
import os
import os.path as osp
import pickle

import numpy as np

CACHE_DIR = os.environ.get(
    "KINET_TEST_TRAIN_CACHE", "/tmp/kinet_test_train_cache"
)
_REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _source_fingerprint() -> str:
    h = hashlib.sha256()
    roots = [osp.join(_REPO, "kinet_tpu"), osp.join(_REPO, "cfgs")]
    for root in roots:
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for fn in sorted(filenames):
                if fn.endswith((".py", ".yaml", ".cpp", ".so")):
                    p = osp.join(dirpath, fn)
                    h.update(p.encode())
                    with open(p, "rb") as fh:
                        h.update(fh.read())
    return h.hexdigest()


def cached_train(recipe_key: dict, train_fn):
    """Return train_fn()'s params pytree, cached across suite runs.

    recipe_key: json-serializable description of everything that shapes
    the training besides the package sources (cfg dump, iters, seeds,
    scene constants). train_fn: () -> params pytree.
    """
    import jax

    key_material = json.dumps(
        {
            "recipe": recipe_key,
            "src": _source_fingerprint(),
            "jax": jax.__version__,
            "platform": jax.default_backend(),
        },
        sort_keys=True,
        default=str,
    )
    key = hashlib.sha256(key_material.encode()).hexdigest()[:24]
    path = osp.join(CACHE_DIR, f"params_{key}.pkl")
    if osp.exists(path):
        try:
            with open(path, "rb") as fh:
                return pickle.load(fh)
        except Exception:
            pass  # truncated write from an interrupted run: retrain
    params = train_fn()
    os.makedirs(CACHE_DIR, exist_ok=True)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as fh:
        pickle.dump(
            jax.tree_util.tree_map(np.asarray, params), fh,
        )
    os.replace(tmp, path)
    return params
