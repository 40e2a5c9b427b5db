"""Preemption handling (reference run_with_submitit.py:42-80).

The reference's submitit Trainer.checkpoint() flips `resume` to the
latest checkpoint and resubmits the SLURM job when preempted. The
TPU-native equivalent: the launcher installs a SIGTERM/SIGUSR1 handler
(SLURM sends these ahead of preemption); the train loop polls
`requested()` once per step, saves a checkpoint and returns early; the
launcher then re-execs itself, and its auto-resume picks up the
checkpoint (kinet_tpu/tools/launch.py).
"""
from __future__ import annotations

import signal

_requested = False


def request(*_args):
    """Mark preemption as requested (signal handler / tests)."""
    global _requested
    _requested = True


def requested() -> bool:
    return _requested


def clear():
    global _requested
    _requested = False


def install(signals=(signal.SIGTERM, signal.SIGUSR1)):
    """Install the request handler; returns the previous handlers."""
    prev = {}
    for s in signals:
        prev[s] = signal.signal(s, request)
    return prev
