"""Config system: merge semantics, dotted overrides, CLI parsing, factory."""

import pytest
import yaml

from dhg.config import (
    DLConfig,
    config_entrypoint,
    fit_config,
    merge_configs,
    object_from_dict,
    parse_cli_kwargs,
    update_config,
)


def test_missing_keys_read_none():
    cfg = DLConfig({"a": {"b": 1}})
    assert cfg.a.b == 1
    assert cfg.a.zzz is None
    assert cfg.nope is None


def test_merge_deep():
    base = {"a": {"x": 1, "y": 2}, "b": 3}
    over = {"a": {"y": 20, "z": 30}, "c": 4}
    out = merge_configs(base, over)
    assert out == {"a": {"x": 1, "y": 20, "z": 30}, "b": 3, "c": 4}


def test_update_dotted():
    cfg = {"a": {"b": {"c": 1}}}
    update_config(cfg, {"a.b.c": 9, "a.b.d": 2, "new.k": 5})
    assert cfg["a"]["b"] == {"c": 9, "d": 2}
    assert cfg["new"]["k"] == 5


def test_parse_cli_kwargs_types():
    out = parse_cli_kwargs(
        ["--training_args.steps=100", "--x.y", "3.5", "--flag", "--s=hello", "--n=null"]
    )
    assert out["training_args.steps"] == 100
    assert out["x.y"] == 3.5
    assert out["flag"] is True
    assert out["s"] == "hello"
    assert out["n"] is None


def test_fit_config_inherits_base(tmp_path):
    (tmp_path / "base.yml").write_text(yaml.safe_dump({"a": {"x": 1, "y": 2}}))
    (tmp_path / "exp.yml").write_text(yaml.safe_dump({"a": {"y": 5}}))
    out = fit_config(config_dir=tmp_path, config="exp.yml", **{"a.x": 7})
    assert out == {"a": {"x": 7, "y": 5}}


def test_entrypoint_with_repo_configs():
    cfg = config_entrypoint(["--config=smoke.yml", "--training_args.steps=3"])
    assert cfg.training_args.steps == 3
    assert cfg.training_args.dataset == "synthetic"
    # inherited from base.yml
    assert cfg.dataset_args.max_seq_len == 480
    assert cfg.optimizer.type == "torch.optim.Adam"


def test_object_from_dict_optimizer():
    kind, params = object_from_dict(
        {"type": "torch.optim.Adam", "params": {"lr": 3e-4, "betas": [0.9, 0.98]}}
    )
    assert kind == "adam"
    assert params["betas"] == [0.9, 0.98]
    with pytest.raises(ImportError):
        object_from_dict({"params": {}})
    with pytest.raises(ImportError):
        object_from_dict({"type": "os.system"})


def test_dump_roundtrip(tmp_path):
    cfg = DLConfig({"a": {"b": [1, 2]}, "c": "x"})
    cfg.dump(tmp_path / "c.yml")
    cfg2 = DLConfig.load(tmp_path / "c.yml")
    assert cfg2.to_dict() == cfg.to_dict()
    assert "a:" in cfg.pretty_text


def test_parse_cli_kwargs_help(capsys):
    """--help/-h prints the caller's help text and exits 0 (fire-CLI parity)."""
    import pytest

    from dhg.config import parse_cli_kwargs

    for flag in ("--help", "-h"):
        with pytest.raises(SystemExit) as exc:
            parse_cli_kwargs([flag], help_text="Usage: things.")
        assert exc.value.code == 0
        assert "Usage: things." in capsys.readouterr().out
    # Without help_text the flag is an ordinary (bad) argument.
    with pytest.raises(SystemExit):
        parse_cli_kwargs(["-h"])  # not --key form -> usage error
