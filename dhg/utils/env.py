"""Environment fingerprinting (reference utils/env.py:11-64, TPU edition)."""

from __future__ import annotations

import platform
import subprocess
import sys


def collect_env() -> dict:
    info: dict[str, str] = {
        "sys.platform": sys.platform,
        "Python": sys.version.replace("\n", ""),
        "Platform": platform.platform(),
    }
    try:
        import jax

        info["JAX"] = jax.__version__
        info["jax.devices"] = ", ".join(str(d) for d in jax.devices())
        info["default_backend"] = jax.default_backend()
    except Exception as e:  # pragma: no cover
        info["JAX"] = f"unavailable ({e})"
    try:
        import flax
        import optax

        info["Flax"] = flax.__version__
        info["Optax"] = optax.__version__
    except Exception:  # pragma: no cover
        pass
    try:
        gcc = subprocess.run(["gcc", "--version"], capture_output=True, text=True, timeout=5)
        info["GCC"] = gcc.stdout.splitlines()[0] if gcc.returncode == 0 else "n/a"
    except Exception:
        info["GCC"] = "n/a"
    return info


def git_sha() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True, timeout=5
        ).stdout.strip()
    except Exception:
        return "unknown"
