"""Multi-host launcher (reference: src/run_with_submitit.py).

The reference submits a SLURM job via submitit with preemption handling:
on checkpoint() it flips `resume` to the latest checkpoint and requeues
(run_with_submitit.py:53-67). The TPU-native equivalent launches one
process per host with `jax.distributed.initialize` coordinates and the
same resume-on-restart semantics: if `output_dir/checkpoint` exists the
job resumes from it automatically (preemption-safe by construction —
every epoch checkpoint is the requeue point).

Single-host usage just runs train directly:

    python -m kinet_tpu.tools.launch --config train.yaml --named ... \
        --coordinator host:port --num-hosts 4 --host-id 0
"""
from __future__ import annotations

import argparse
import os
import os.path as osp


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="train.yaml")
    p.add_argument("--named", nargs="*", default=[])
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (multi-host only)")
    p.add_argument("--num-hosts", type=int, default=1)
    p.add_argument("--host-id", type=int, default=None)
    p.add_argument(
        "--requeue-on-preempt", action="store_true",
        help="install SIGTERM/SIGUSR1 handlers: checkpoint mid-epoch and "
        "re-exec this launcher, which auto-resumes (submitit-requeue "
        "equivalent, reference run_with_submitit.py:53-67)",
    )
    p.add_argument("overrides", nargs="*", default=[])
    args = p.parse_args(argv)

    if args.requeue_on_preempt:
        from ..utils import preempt

        preempt.install()

    if args.coordinator:
        import jax

        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_hosts,
            process_id=(
                args.host_id
                if args.host_id is not None
                else int(os.environ.get("TPU_WORKER_ID", 0))
            ),
        )

    from ..config import load_config, parse_cli_overrides
    from ..engine.train import train

    cfg = load_config(
        args.config, named=args.named,
        overrides=parse_cli_overrides(args.overrides),
    )
    # preemption-safe auto-resume (≙ submitit checkpoint() requeue,
    # reference run_with_submitit.py:53-67)
    if cfg.output_dir and not cfg.resume:
        latest = osp.join(cfg.output_dir, "checkpoint")
        if osp.exists(latest):
            cfg = cfg.replace(resume=latest, resume_optim=True)
            print(f"auto-resuming from {latest}")
    train(cfg)

    if args.requeue_on_preempt:
        import sys

        from ..utils import preempt

        if preempt.requested():
            # requeue: re-exec this launcher; the auto-resume branch above
            # picks up the checkpoint the train loop just saved
            print("requeueing after preemption")
            os.execv(
                sys.executable,
                [sys.executable, "-m", "kinet_tpu.tools.launch"]
                + (argv if argv is not None else sys.argv[1:]),
            )


if __name__ == "__main__":
    main()
