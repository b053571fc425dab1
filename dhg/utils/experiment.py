"""Experiment harness: run dirs, seeding, env logging, artifacts.

Parity with the reference (utils/experiment.py):
  * run dir layout work_dir/<exp_name>/<dd.mm>/<HH.MM.SS> (lines 20-34);
  * env fingerprint + git SHA + user@host into meta (lines 37-47);
  * seed handling (lines 50-74) — JAX RNG is explicit-key, so the seed
    becomes the root PRNG key; numpy/python are seeded for the data path;
  * log_artifacts dumps the resolved config.yml + report.json (lines 94-101).
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


def create_workdir(cfg: DLConfig, meta: dict) -> dict:
    dirname = f"{cfg.experiment.name}/{datetime.now().strftime('%d.%m/%H.%M.%S')}"
    meta["run_name"] = dirname
    meta["exp_dir"] = Path(cfg.experiment.work_dir) / dirname
    mkdir_or_exist(meta["exp_dir"])
    return meta


def env_collect(meta: dict, logger: logging.Logger) -> dict:
    env_info = "\n".join(f"{k}: {v}" for k, v in collect_env().items())
    dash_line = "-" * 60 + "\n"
    logger.info("Environment info:\n" + dash_line + env_info + "\n" + dash_line)
    meta["sha"] = git_sha()
    meta["host_name"] = f"{getuser()}@{gethostname()}"
    return meta


def set_random_seed(seed: int = 42, precision: int = 10, deterministic: bool = False) -> None:
    random.seed(seed)
    np.random.seed(seed)
    np.set_printoptions(precision=precision)
    os.environ["PYTHONHASHSEED"] = str(seed)
    # JAX: no global RNG to seed — training threads the root key explicitly
    # (jax.random.PRNGKey(seed)); XLA is deterministic per compiled program.


def determine_exp(cfg: DLConfig, meta: dict, logger: logging.Logger) -> dict:
    if cfg.experiment.seed is not None:
        logger.info(f"Set random seed to {cfg.experiment.seed}, deterministic: False \n")
        set_random_seed(
            cfg.experiment.seed,
            precision=cfg.experiment.precision or 10,
            deterministic=False,
        )
    meta["seed"] = cfg.experiment.seed
    meta["exp_name"] = cfg.experiment.name
    return meta


def log_artifacts(cfg: DLConfig, meta: dict) -> None:
    cfg.dump(meta["exp_dir"] / "config.yml")
    with open(Path(meta["exp_dir"]) / "report.json", "w") as f:
        meta = dict(meta)
        meta["exp_dir"] = str(meta["exp_dir"])
        json.dump(meta, f, indent=4)


def prepare_exp(cfg: DLConfig) -> tuple[dict, logging.Logger]:
    meta: dict = {}
    meta = create_workdir(cfg, meta)
    logger = get_logger("train", meta["exp_dir"])
    meta = env_collect(meta, logger=logger)
    meta = determine_exp(cfg, meta, logger=logger)
    return meta, logger
