"""Multi-host (multi-process) seam — jax.distributed wiring.

The reference is strictly single-process (SURVEY §2: no torch.distributed,
no process groups anywhere). dhg's SPMD design already scales over every
device one process can see (Mesh + NamedSharding, dhg/parallel/mesh.py);
this module adds the one missing piece for multi-HOST scale-out: process
group initialization, so `jax.devices()` becomes the GLOBAL device set and
the same mesh/sharding code runs unchanged over ICI+DCN (SURVEY §2 comms
row: "multi-slice via DCN if ever needed").

Configuration (either source; config wins):

  * config: training_args.distributed:
        coordinator_address: "10.0.0.1:1234"   # process 0's address
        num_processes: 2
        process_id: 0                          # per-process
    or `training_args.distributed: auto` — call jax.distributed.initialize()
    with no args (TPU pods auto-detect coordinator/count/id from the
    metadata server; the standard GKE/QR path).
  * env (for launchers that template environment per process):
        DHG_COORDINATOR, DHG_NUM_PROCESSES, DHG_PROCESS_ID

After initialization every process runs the IDENTICAL program: same config,
same seed, same PRNG keys -> same gather indices -> the global batch is
sharded across all hosts' devices by the very with_sharding_constraint
calls that shard it across local devices today (dhg/train.py::_build_step).
Only host-side ARTIFACTS are gated to process 0 (run dir, run.log,
metrics.jsonl, checkpoints) — see is_main() call sites in dhg/train.py.

Proven by tests/test_distributed.py: a real 2-process x 4-virtual-CPU-device
run matches a single-process 8-device run's per-step losses exactly.
"""

from __future__ import annotations

import logging
import os

import jax

log = logging.getLogger(__name__)

_initialized = False


def initialize_from_config(cfg) -> bool:
    """Initialize jax.distributed if configured; returns True if this run
    is multi-process. Must be called BEFORE any other JAX API touches the
    backend (dhg.train.main calls it first thing)."""
    global _initialized
    dist = None
    if cfg is not None:
        dist = cfg.training_args.distributed
    if dist is None and os.environ.get("DHG_COORDINATOR"):
        dist = {
            "coordinator_address": os.environ["DHG_COORDINATOR"],
            "num_processes": int(os.environ["DHG_NUM_PROCESSES"]),
            "process_id": int(os.environ["DHG_PROCESS_ID"]),
        }
    if dist is None:
        return False
    if dist == "auto":
        # TPU pod slice: coordinator/count/id come from the TPU metadata
        # environment (the standard multi-host launch path).
        jax.distributed.initialize()
    else:
        if not isinstance(dist, dict):
            raise ValueError(
                "training_args.distributed must be 'auto' or a mapping with "
                f"coordinator_address/num_processes/process_id, got {dist!r}"
            )
        jax.distributed.initialize(
            coordinator_address=str(dist["coordinator_address"]),
            num_processes=int(dist["num_processes"]),
            process_id=int(dist["process_id"]),
        )
    _initialized = True
    log.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
    return True


def is_main() -> bool:
    """True on the process that owns run-dir artifacts (always True
    single-process)."""
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def is_multiprocess() -> bool:
    return _initialized or jax.process_count() > 1
