"""Multi-host helpers (reference: util/misc.py:91-159, 494-538).

The reference pickles python objects into byte tensors and all_gathers
them over NCCL (misc.py:91-132). The JAX equivalent ships bytes through
`multihost_utils.broadcast_one_to_all` / process_allgather; loss dicts
reduce with a plain jnp mean since the train step already produces
globally-reduced values under SPMD jit.
"""
from __future__ import annotations

import pickle

import jax
import numpy as np


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return get_rank() == 0


def is_dist_avail_and_initialized() -> bool:
    return get_world_size() > 1


def all_gather_objects(obj, max_bytes: int = 1 << 24):
    """Gather arbitrary picklable objects from every host
    (≙ reference all_gather, misc.py:91-132)."""
    world = get_world_size()
    if world == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = pickle.dumps(obj)
    assert len(payload) <= max_bytes, (len(payload), max_bytes)
    buf = np.zeros(max_bytes + 8, np.uint8)
    buf[:8] = np.frombuffer(
        np.int64(len(payload)).tobytes(), np.uint8
    )
    buf[8 : 8 + len(payload)] = np.frombuffer(payload, np.uint8)
    gathered = multihost_utils.process_allgather(buf)
    out = []
    for row in np.asarray(gathered).reshape(world, -1):
        n = int(np.frombuffer(row[:8].tobytes(), np.int64)[0])
        out.append(pickle.loads(row[8 : 8 + n].tobytes()))
    return out


def reduce_dict(d: dict) -> dict:
    """≙ reference reduce_dict (misc.py:135-159). Under SPMD jit the loss
    values are already global; this exists for host-side dicts."""
    if get_world_size() == 1:
        return d
    gathered = all_gather_objects(d)
    keys = gathered[0].keys()
    return {
        k: float(np.mean([float(g[k]) for g in gathered])) for k in keys
    }


def save_on_master(save_fn, *args, **kwargs):
    if is_main_process():
        save_fn(*args, **kwargs)


def setup_for_distributed(is_master: bool | None = None):
    """Suppress prints on non-primary hosts (reference util/misc.py:462-483
    monkey-patches builtins.print and Visdom; here just print)."""
    import builtins

    if is_master is None:
        is_master = is_main_process()
    if is_master:
        return
    orig_print = builtins.print

    def print_(*args, force: bool = False, **kwargs):
        if force:
            orig_print(*args, **kwargs)

    builtins.print = print_
