"""Experiment harness: run dirs, seeding, env logging, artifacts.

Behavioral contract with the reference harness (utils/experiment.py) — the
*emitted artifacts* are kept byte-compatible, the code is our own shape:
  * run dir layout work_dir/<exp_name>/<dd.mm>/<HH.MM.SS> (lines 20-34);
  * the "Environment info:" banner and "Set random seed to ..." log lines;
  * report.json schema {run_name, exp_dir, sha, host_name, seed, exp_name}
    (shipped example: data/best_exp/report.json) + resolved config.yml dump.

Design: one ExperimentDir object owns the run directory, its logger, and
the report metadata. The reference's five free functions threading a meta
dict exist only as thin compatibility wrappers around it.

Seeding: JAX has no global RNG — training threads jax.random.PRNGKey(seed)
explicitly; numpy/python are seeded here for the (host-side) data path.
"""

from __future__ import annotations

import json
import logging
import os
import random
from datetime import datetime
from getpass import getuser
from pathlib import Path
from socket import gethostname

import numpy as np

from dhg.config import DLConfig
from dhg.utils.env import collect_env, git_sha
from dhg.utils.log import get_logger
from dhg.utils.path import mkdir_or_exist


def set_random_seed(seed: int = 42, precision: int = 10, deterministic: bool = False) -> None:
    random.seed(seed)
    np.random.seed(seed)
    np.set_printoptions(precision=precision)
    os.environ["PYTHONHASHSEED"] = str(seed)
    # XLA programs are deterministic per compile; nothing further to pin.


class ExperimentDir:
    """A training run's directory + logger + report metadata, in one place."""

    def __init__(self, cfg: DLConfig, logger_name: str = "train"):
        self.cfg = cfg
        run_name = f"{cfg.experiment.name}/{datetime.now().strftime('%d.%m/%H.%M.%S')}"
        self.path = Path(cfg.experiment.work_dir) / run_name
        mkdir_or_exist(self.path)
        self.logger = get_logger(logger_name, self.path)
        self.meta: dict = {
            "run_name": run_name,
            "exp_dir": self.path,
            "sha": git_sha(),
            "host_name": f"{getuser()}@{gethostname()}",
            "seed": cfg.experiment.seed,
            "exp_name": cfg.experiment.name,
        }
        self._log_env()
        self._seed()

    def _log_env(self) -> None:
        env_info = "\n".join(f"{k}: {v}" for k, v in collect_env().items())
        dash_line = "-" * 60 + "\n"
        self.logger.info("Environment info:\n" + dash_line + env_info + "\n" + dash_line)

    def _seed(self) -> None:
        seed = self.cfg.experiment.seed
        if seed is not None:
            self.logger.info(f"Set random seed to {seed}, deterministic: False \n")
            set_random_seed(seed, precision=self.cfg.experiment.precision or 10)

    def write_artifacts(self) -> None:
        """Dump the resolved config.yml + report.json into the run dir."""
        self.cfg.dump(self.path / "config.yml")
        report = dict(self.meta, exp_dir=str(self.meta["exp_dir"]))
        with open(self.path / "report.json", "w") as f:
            json.dump(report, f, indent=4)


# -- reference-shaped compatibility API --------------------------------------


def prepare_exp(cfg: DLConfig) -> tuple[dict, logging.Logger]:
    exp = ExperimentDir(cfg)
    meta = dict(exp.meta)
    meta["_exp"] = exp
    return meta, exp.logger


def log_artifacts(cfg: DLConfig, meta: dict) -> None:
    exp: ExperimentDir | None = meta.get("_exp")
    if exp is None:  # meta assembled by hand (tests): rebuild the report
        exp = ExperimentDir.__new__(ExperimentDir)
        exp.cfg = cfg
        exp.path = Path(meta["exp_dir"])
        exp.meta = {k: v for k, v in meta.items() if not k.startswith("_")}
    exp.write_artifacts()
