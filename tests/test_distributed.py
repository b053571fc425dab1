"""Multi-host seam: a REAL 2-process jax.distributed run on CPU.

Proves the round-4 multi-process wiring (dhg/parallel/distributed.py +
dhg.train.main): two OS processes x 4 virtual CPU devices each form one
8-device global mesh, run the full training CLI path in SPMD lockstep, and
the per-step losses match a single-process 8-device run of the identical
config EXACTLY — i.e. per-host batch sharding + XLA's cross-process
gradient psum reproduce the single-process trajectory.

Also pins the artifact-ownership contract: only process 0 creates a run
dir / metrics.jsonl / checkpoints.

The reference has no distributed path at all (SURVEY §2: no
torch.distributed, no process groups — single device via utils/nn.py:12-16).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
out_dir, nprocs, procid, port = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
from dhg.config import DLConfig, fit_config
over = {
    "experiment.work_dir": out_dir,
    "training_args.steps": 4,
    "training_args.batch_size": 8,
    "training_args.max_files": 16,
    "training_args.channels": 32,
    "training_args.att_layers_num": 1,
    "training_args.compute_dtype": "float32",
    "training_args.log_freq": 1,
    "training_args.save_freq": 100,
    "dataset_args.max_seq_len": 96,
    "dataset_args.max_text_len": 20,
}
if nprocs > 1:
    over["training_args.distributed"] = {
        "coordinator_address": "127.0.0.1:" + port,
        "num_processes": nprocs,
        "process_id": procid,
    }
cfg = DLConfig(fit_config(config="smoke.yml", **over))
from dhg.train import main
main(cfg)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(script: str, out_dir: str, nprocs: int, procid: int, port: int, devices: int):
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devices}"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    return subprocess.Popen(
        [sys.executable, script, out_dir, str(nprocs), str(procid), str(port)],
        cwd=REPO,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )


def _read_losses(work_dir) -> list[dict]:
    metrics = list(work_dir.rglob("metrics.jsonl"))
    assert len(metrics) == 1, f"expected exactly one run dir, found {metrics}"
    rows = [json.loads(ln) for ln in metrics[0].read_text().splitlines()]
    return [r for r in rows if "loss" in r]


@pytest.mark.slow
def test_two_process_matches_single_process(tmp_path):
    script = tmp_path / "driver.py"
    script.write_text(DRIVER)

    # Single-process reference: one process, 8 virtual devices.
    solo_dir = tmp_path / "solo"
    p = _spawn(str(script), str(solo_dir), 1, 0, 0, devices=8)
    out, _ = p.communicate(timeout=900)
    assert p.returncode == 0, out.decode()

    # The real thing: 2 processes x 4 devices = the same 8-device mesh.
    dist_dir = tmp_path / "dist"
    port = _free_port()
    procs = [_spawn(str(script), str(dist_dir), 2, i, port, devices=4) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out.decode())
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(outs)

    solo = _read_losses(solo_dir)
    dist = _read_losses(dist_dir)
    assert [r["step"] for r in solo] == [r["step"] for r in dist] == [2, 3, 4, 5]
    solo_l = np.array([[r["loss"], r["score"], r["pen"]] for r in solo])
    dist_l = np.array([[r["loss"], r["score"], r["pen"]] for r in dist])
    # Same global mesh shape, same keys, same partitioned program: the
    # cross-process run must reproduce the single-process losses (metrics
    # travel through a 3-decimal log format; compare at that precision).
    np.testing.assert_allclose(dist_l, solo_l, atol=2e-3)

    # Artifact ownership: exactly ONE run dir exists under dist_dir (process
    # 0's); the non-main placeholder path was never created.
    assert not list(dist_dir.rglob("nonmain-process-*"))
    run_logs = list(dist_dir.rglob("run.log"))
    assert len(run_logs) == 1


@pytest.mark.slow
def test_env_var_initialization(tmp_path):
    """DHG_COORDINATOR/DHG_NUM_PROCESSES/DHG_PROCESS_ID initialize the
    process group without any config — the launcher-template path."""
    script = tmp_path / "envdriver.py"
    script.write_text(
        """
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
from dhg.parallel import distributed as dist
assert dist.initialize_from_config(None) is True
assert jax.process_count() == 2
assert jax.device_count() == 4
print("ENVOK", jax.process_index(), dist.is_main(), flush=True)
"""
    )
    port = _free_port()
    procs = []
    for i in range(2):
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env["DHG_COORDINATOR"] = f"127.0.0.1:{port}"
        env["DHG_NUM_PROCESSES"] = "2"
        env["DHG_PROCESS_ID"] = str(i)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                cwd=REPO,
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(outs)
    assert "ENVOK 0 True" in outs[0]
    assert "ENVOK 1 False" in outs[1]
