"""Filesystem helpers (reference utils/path.py:4-27)."""

from __future__ import annotations

import os
from pathlib import Path


def check_file_exist(filename, msg_tmpl: str = 'file "{}" does not exist'):
    if not Path(filename).is_file():
        raise FileNotFoundError(msg_tmpl.format(filename))


def mkdir_or_exist(dir_name, mode: int = 0o777) -> None:
    if dir_name == "":
        return
    os.makedirs(os.path.expanduser(str(dir_name)), mode=mode, exist_ok=True)
