"""SLURM binding for multi-host TPU training (reference:
src/run_with_submitit.py:83-124).

The reference parametrizes a submitit SLURM executor (partition, GPUs,
mem, timeout, constraint/comment/exclude, auto-requeue with
slurm_max_num_timeout). The TPU-native equivalent emits an sbatch script
that runs ONE TASK PER HOST of a TPU slice: every task starts
`kinet_tpu.tools.launch` with `jax.distributed` coordinates derived from
the SLURM node list, preemption requeue is handled by `--signal=USR1@60`
+ `#SBATCH --requeue` + the launcher's SIGUSR1 checkpoint-and-requeue
handler (utils/preempt.py ≙ submitit's checkpoint(), reference
run_with_submitit.py:53-67), and resume-on-restart is automatic because
the launcher reloads `output_dir/checkpoint` when present.

Usage:
    python -m kinet_tpu.tools.slurm_launch \
        --partition tpu --nodes 4 --time 720 --mem 128 \
        --config train.yaml --named train_deformable train_tracking \
        [--dry-run] [override key=value ...]
"""
from __future__ import annotations

import argparse
import os
import shlex
import shutil
import subprocess
import sys

SBATCH_TEMPLATE = """#!/bin/bash
#SBATCH --job-name={job_name}
#SBATCH --partition={partition}
#SBATCH --nodes={nodes}
#SBATCH --ntasks-per-node=1
#SBATCH --cpus-per-task={cpus}
#SBATCH --mem={mem}G
#SBATCH --time={time_min}
#SBATCH --output={job_dir}/%j_%t_log.out
#SBATCH --error={job_dir}/%j_%t_log.err
#SBATCH --signal=USR1@{signal_delay}
#SBATCH --requeue
{extra_directives}
# one task per TPU host; task 0's node is the jax.distributed coordinator
COORD_HOST=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n 1)
export KINET_COORDINATOR="$COORD_HOST:{coordinator_port}"
srun --kill-on-bad-exit=1 bash -c '
  exec {python} -m kinet_tpu.tools.launch \\
    --coordinator "$KINET_COORDINATOR" \\
    --num-hosts {nodes} \\
    --host-id "$SLURM_PROCID" \\
    --requeue-on-preempt \\
    {launch_args}
'
"""


def build_script(args, launch_args: list[str]) -> str:
    extra = []
    if args.constraint:
        extra.append(f"#SBATCH --constraint={args.constraint}")
    if args.comment:
        extra.append(f"#SBATCH --comment={shlex.quote(args.comment)}")
    if args.exclude:
        extra.append(f"#SBATCH --exclude={args.exclude}")
    if args.account:
        extra.append(f"#SBATCH --account={args.account}")
    return SBATCH_TEMPLATE.format(
        job_name=args.job_name,
        partition=args.partition,
        nodes=args.nodes,
        cpus=args.cpus_per_task,
        mem=args.mem,
        time_min=args.time,
        job_dir=args.job_dir,
        signal_delay=args.signal_delay,
        extra_directives="\n".join(extra),
        coordinator_port=args.coordinator_port,
        python=args.python,
        launch_args=" ".join(shlex.quote(a) for a in launch_args),
    )


def _submit_config_defaults(path: str) -> dict:
    """Load scheduler defaults from a submit config (≙ reference
    cfgs/submit.yaml read by run_with_submitit.py:88-96). Keys mirror the
    argparse flags; unknown keys are rejected so typos don't silently
    no-op."""
    import yaml

    with open(path) as fh:
        raw = yaml.safe_load(fh) or {}
    known = {
        "partition", "nodes", "time", "mem", "cpus_per_task", "job_name",
        "job_dir", "constraint", "comment", "exclude", "account",
        "coordinator_port", "signal_delay",
    }
    unknown = set(raw) - known
    if unknown:
        raise SystemExit(
            f"unknown submit-config keys in {path}: {sorted(unknown)}"
        )
    return raw


def main(argv=None):
    p = argparse.ArgumentParser()
    # scheduler parameters (≙ reference run_with_submitit.py:88-113);
    # defaults can come from a submit config file (≙ cfgs/submit.yaml)
    p.add_argument("--submit-config", default="",
                   help="YAML with scheduler defaults (cfgs/submit.yaml); "
                        "explicit CLI flags override it")
    p.add_argument("--partition", default="tpu")
    p.add_argument("--nodes", type=int, default=1, help="TPU hosts")
    p.add_argument("--time", type=int, default=60 * 72,
                   help="timeout minutes (reference caps at 60*72)")
    p.add_argument("--mem", type=int, default=64, help="GB per node")
    p.add_argument("--cpus-per-task", type=int, default=16)
    p.add_argument("--job-name", default="kinet")
    p.add_argument("--job-dir", default="runs/slurm")
    p.add_argument("--constraint", default="")
    p.add_argument("--comment", default="")
    p.add_argument("--exclude", default="")
    p.add_argument("--account", default="")
    p.add_argument("--coordinator-port", type=int, default=8476)
    p.add_argument("--signal-delay", type=int, default=60,
                   help="seconds of USR1 warning before preemption")
    p.add_argument("--python", default=sys.executable)
    p.add_argument("--dry-run", action="store_true",
                   help="print the sbatch script instead of submitting")
    # training parameters forwarded to kinet_tpu.tools.launch
    p.add_argument("--config", default="train.yaml")
    p.add_argument("--named", nargs="*", default=[])
    p.add_argument("overrides", nargs="*", default=[])
    pre, _ = p.parse_known_args(argv)
    if pre.submit_config:
        p.set_defaults(**_submit_config_defaults(pre.submit_config))
    args = p.parse_args(argv)

    launch_args = ["--config", args.config]
    if args.named:
        launch_args += ["--named", *args.named]
    launch_args += args.overrides

    script = build_script(args, launch_args)
    if args.dry_run:
        print(script)
        return 0

    os.makedirs(args.job_dir, exist_ok=True)
    path = os.path.join(args.job_dir, "submit.sbatch")
    with open(path, "w") as fh:
        fh.write(script)
    if shutil.which("sbatch") is None:
        print(
            f"sbatch not found — script written to {path}; submit it on a "
            "SLURM head node",
            file=sys.stderr,
        )
        return 0
    proc = subprocess.run(
        ["sbatch", path], capture_output=True, text=True
    )
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
