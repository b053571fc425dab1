"""Logging — same handler layout and line format as the reference
(utils/log.py:44-60): StreamHandler(stdout) + FileHandler(<run dir>/run.log,
mode 'w'), format '%(asctime)s - [%(levelname)s] %(message)s'; idempotent via
a module-global registry.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

_initialized: dict[str, logging.Logger] = {}

FORMAT = "%(asctime)s - [%(levelname)s] %(message)s"


def get_logger(name: str, log_dir: Path | str | None = None) -> logging.Logger:
    if name in _initialized:
        return _initialized[name]

    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    formatter = logging.Formatter(FORMAT)

    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(formatter)
    logger.addHandler(sh)

    if log_dir is not None:
        fh = logging.FileHandler(Path(log_dir) / "run.log", mode="w")
        fh.setFormatter(formatter)
        logger.addHandler(fh)

    _initialized[name] = logger
    return logger
