"""Config system: YAML with base.yml inheritance + dotted CLI overrides.

Same interface contract as the reference (config.py:11-144) with zero extra
dependencies (the reference needs addict + ruamel.yaml + python-fire):

  * DLConfig — attribute-style access that returns None for missing keys
    (CfgDict.__missing__ parity), plus load/dump/pretty_text;
  * fit_config — loads configs/base.yml, deep-merges the named config over
    it, then applies dotted-path overrides (--a.b.c=v);
  * object_from_dict — reflection factory for {type: ..., params: {...}}
    dicts; torch.optim.* names are mapped to the equivalent optax
    constructors so the reference's YAML schema works verbatim;
  * config_entrypoint — CLI kwargs harvesting (replaces fire.Fire).

YAML values given on the CLI are parsed with yaml.safe_load, so
--training_args.steps=100 arrives as an int and --training_args.max_files=null
as None, matching fire's behavior.
"""

from __future__ import annotations

import io
import sys
from os import PathLike
from pathlib import Path
from typing import Any

import yaml

CONFIG_DIR = Path(__file__).parent.parent / "configs"


class CfgDict(dict):
    """dict with attribute access; missing keys read as None."""

    def __getattr__(self, key):
        if key.startswith("__"):
            raise AttributeError(key)
        return self.get(key)

    def __setattr__(self, key, value):
        self[key] = value

    def __missing__(self, key):
        return None

    def get(self, key, default=None):
        v = super().get(key, default)
        return _wrap(v)

    def __getitem__(self, key):
        if key not in self:
            return None
        return _wrap(super().__getitem__(key))


def _wrap(v):
    if isinstance(v, dict) and not isinstance(v, CfgDict):
        return CfgDict(v)
    return v


class DLConfig:
    """Config object: attribute access over a plain-YAML-dumpable dict."""

    def __init__(self, cfg: dict):
        self._raw = cfg
        self._cfg = CfgDict(cfg)

    def __getattr__(self, item):
        if item.startswith("_"):
            raise AttributeError(item)
        return self._cfg[item]

    def __getitem__(self, key):
        return self._cfg[key]

    def to_dict(self) -> dict:
        return self._raw

    @classmethod
    def load(cls, path: PathLike | str) -> "DLConfig":
        with open(path) as f:
            return cls(yaml.safe_load(f))

    def dump(self, path: PathLike | str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self._raw, f, sort_keys=False)

    @property
    def pretty_text(self) -> str:
        buf = io.StringIO()
        yaml.safe_dump(self._raw, buf, sort_keys=False)
        return buf.getvalue()


def merge_configs(base_cfg: dict, cfg: dict) -> dict:
    """Deep-merge cfg over base_cfg in place (reference config.py:57-69)."""
    for k, v in cfg.items():
        if isinstance(v, dict):
            if k not in base_cfg or not isinstance(base_cfg.get(k), dict):
                base_cfg[k] = {}
            merge_configs(base_cfg[k], v)
        else:
            base_cfg[k] = v
    return base_cfg


def update_config(config: dict, params: dict) -> dict:
    """Apply dotted-path overrides {'a.b.c': v} (reference config.py:72-86)."""
    for k, v in params.items():
        *path, key = k.split(".")
        node = config
        for p in path:
            if p not in node or not isinstance(node[p], dict):
                node[p] = {}
            node = node[p]
        node[key] = v
    return config


def fit_config(config_dir: PathLike | str | None = None, **kwargs) -> dict:
    """base.yml -> deep-merge named config -> dotted overrides."""
    cfg_dir = Path(config_dir) if config_dir else CONFIG_DIR
    with open(cfg_dir / "base.yml") as f:
        base = yaml.safe_load(f)

    if "config" in kwargs:
        name = kwargs.pop("config")
        path = Path(name)
        if not path.exists():
            path = cfg_dir / name
        with open(path) as f:
            base = merge_configs(base, yaml.safe_load(f))

    return update_config(base, kwargs)


# torch.optim names (the reference YAML schema) -> optax gradient transforms.
# See dhg.train.make_optimizer for how `params` (lr, weight_decay, betas) are
# consumed: the reference overwrites the YAML lr every step with the Noam
# schedule (scheduler.py:24-29, train.py:150-155), and torch Adam's
# weight_decay is L2-into-gradient — both reproduced exactly.
OPTIMIZER_REGISTRY = {
    "torch.optim.Adam": "adam",
    "torch.optim.AdamW": "adamw",
    "torch.optim.SGD": "sgd",
    "optax.adam": "adam",
    "optax.adamw": "adamw",
    "optax.sgd": "sgd",
}


def object_from_dict(d: dict, **default_kwargs) -> tuple[str, dict]:
    """Resolve a {type, params} dict to (optax kind, params).

    Unlike the reference's pydoc.locate (config.py:112-136), resolution goes
    through an explicit registry: arbitrary import-by-string of untrusted
    config is a misfeature we drop deliberately.
    """
    kwargs = dict(d)
    object_type = kwargs.pop("type", None)
    if object_type is None:
        raise ImportError("Can't initialize any object from dict without `type` key")
    if object_type not in OPTIMIZER_REGISTRY:
        raise ImportError(f"Unknown optimizer type {object_type!r}")
    params = dict(kwargs.pop("params", None) or {})
    for name, value in default_kwargs.items():
        params.setdefault(name, value)
    return OPTIMIZER_REGISTRY[object_type], params


def parse_cli_kwargs(
    argv: list[str] | None = None, help_text: str | None = None
) -> dict[str, Any]:
    """Parse --key=value / --key value pairs; values go through yaml.safe_load.

    --help / -h prints `help_text` (callers pass their module docstring —
    the reference's fire.Fire CLI auto-generated help, config.py:139-144)
    and exits 0."""
    argv = list(sys.argv[1:] if argv is None else argv)
    if help_text is not None and ("--help" in argv or "-h" in argv):
        print(help_text.strip())
        raise SystemExit(0)
    out: dict[str, Any] = {}
    i = 0
    while i < len(argv):
        arg = argv[i]
        if not arg.startswith("--"):
            raise SystemExit(f"unexpected argument {arg!r} (expected --key=value)")
        arg = arg[2:]
        if "=" in arg:
            key, val = arg.split("=", 1)
        else:
            key = arg
            if i + 1 < len(argv) and not argv[i + 1].startswith("--"):
                i += 1
                val = argv[i]
            else:
                val = "true"
        try:
            out[key] = yaml.safe_load(val)
        except yaml.YAMLError:
            out[key] = val
        i += 1
    return out


def config_entrypoint(
    argv: list[str] | None = None, help_text: str | None = None
) -> DLConfig:
    """Build the run config from CLI args (reference config.py:139-144)."""
    return DLConfig(fit_config(**parse_cli_kwargs(argv, help_text=help_text)))
