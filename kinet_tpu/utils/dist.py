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


def all_gather_objects(obj):
    """Gather arbitrary picklable objects from every host
    (≙ reference all_gather, misc.py:91-132).

    Two-phase like the reference (misc.py:107-118): first allgather the
    byte LENGTHS (8 bytes/host), then allgather payloads padded only to
    max(len) — traffic is payload-proportional, not a fixed 16 MB/host.
    """
    world = get_world_size()
    if world == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    lengths = np.asarray(
        multihost_utils.process_allgather(np.int64(len(payload)))
    ).reshape(-1)
    buf = np.zeros(_gather_buf_bytes(lengths), np.uint8)
    buf[: len(payload)] = payload
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    out = []
    for i, row in enumerate(gathered.reshape(world, -1)):
        out.append(pickle.loads(row[: int(lengths[i])].tobytes()))
    return out


def _gather_buf_bytes(lengths) -> int:
    """Per-host payload buffer size: max actual length (min 1 so the
    allgather always has a non-empty array to ship)."""
    return max(1, int(np.max(lengths)))


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
