"""SLURM binding (tools/slurm_launch.py ≙ reference
run_with_submitit.py:83-124): the generated sbatch script must carry the
scheduler parametrization, the per-host launch with jax.distributed
coordinates, and the preemption-requeue wiring."""
import subprocess
import sys


def _script(*extra):
    from kinet_tpu.tools import slurm_launch

    argv = [
        "--dry-run", "--partition", "v5e", "--nodes", "4", "--time", "720",
        "--mem", "128", "--job-name", "kinet-mot17",
        "--constraint", "tpu-v5e", "--comment", "mot17 run",
        "--config", "train.yaml", "--named", "train_deformable",
        "train_tracking", *extra, "lr=1e-4",
    ]
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = slurm_launch.main(argv)
    assert rc == 0
    return buf.getvalue()


def test_sbatch_script_contents():
    s = _script()
    # scheduler parametrization (reference run_with_submitit.py:88-113)
    assert "#SBATCH --partition=v5e" in s
    assert "#SBATCH --nodes=4" in s
    assert "#SBATCH --mem=128G" in s
    assert "#SBATCH --time=720" in s
    assert "#SBATCH --constraint=tpu-v5e" in s
    assert "#SBATCH --requeue" in s
    assert "--signal=USR1@60" in s
    # one task per host, coordinator from the node list
    assert "scontrol show hostnames" in s
    assert "--ntasks-per-node=1" in s
    assert "--num-hosts 4" in s
    assert '--host-id "$SLURM_PROCID"' in s
    # preemption requeue path (utils/preempt.py handler)
    assert "--requeue-on-preempt" in s
    # training args forwarded
    assert "--named train_deformable train_tracking" in s
    assert "lr=1e-4" in s


def test_sbatch_script_is_valid_bash():
    s = _script()
    proc = subprocess.run(
        ["bash", "-n", "/dev/stdin"], input=s, text=True,
        capture_output=True,
    )
    assert proc.returncode == 0, proc.stderr


def test_submit_config_defaults(tmp_path):
    # cfgs/submit.yaml supplies scheduler defaults (≙ reference
    # run_with_submitit.py:88-96); explicit CLI flags still win
    s = _script("--submit-config", "cfgs/submit.yaml")
    assert "#SBATCH --partition=v5e" in s  # CLI flag overrides the yaml
    assert "--signal=USR1@60" in s  # yaml default flows through

    cfg = tmp_path / "submit.yaml"
    cfg.write_text("partition: pool9\nsignal_delay: 120\nnodes: 8\n")
    from kinet_tpu.tools import slurm_launch
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = slurm_launch.main(
            ["--dry-run", "--submit-config", str(cfg), "--nodes", "2"]
        )
    assert rc == 0
    s = buf.getvalue()
    assert "#SBATCH --partition=pool9" in s  # yaml default used
    assert "--signal=USR1@120" in s
    assert "#SBATCH --nodes=2" in s  # CLI beats yaml

    bad = tmp_path / "bad.yaml"
    bad.write_text("num_gpus: 4\n")  # GPU-era key: must be rejected
    import pytest

    with pytest.raises(SystemExit):
        slurm_launch.main(["--dry-run", "--submit-config", str(bad)])


def test_cli_entry_dry_run():
    proc = subprocess.run(
        [
            sys.executable, "-m", "kinet_tpu.tools.slurm_launch",
            "--dry-run", "--nodes", "2",
        ],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr
    assert "#SBATCH --nodes=2" in proc.stdout
