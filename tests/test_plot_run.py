"""Plot tool: parses dhg metrics.jsonl AND the reference run.log format."""

import json

from dhg.tools.plot_run import load_history, main, parse_log


REFERENCE_LOG = """\
2026-01-01 16:19:47,997 - [INFO] Environment info:
2026-01-01 16:22:17,104 - [INFO] Step 5 | Loss: 2.524 | Score: 2.143 | Pen: 0.381 | Time: 0.777 sec
2026-01-01 16:22:17,479 - [INFO] Step 10 | Loss: 2.478 | Score: 2.106 | Pen: 0.372 | Time: 1.152 sec
2026-01-01 16:22:18,000 - [INFO] Step 10 | Val Loss: 2.400 | Val Score: 2.050 | Val Pen: 0.350
2026-01-01 16:22:18,100 - [INFO] Saving checkpoint...
"""


def test_parse_reference_log_format():
    hist = parse_log(REFERENCE_LOG)
    assert [r["step"] for r in hist["train"]] == [5, 10]
    assert hist["train"][0]["loss"] == 2.524
    assert hist["train"][1]["pen"] == 0.372
    assert hist["val"] == [
        {"step": 10, "val_loss": 2.4, "val_score": 2.05, "val_pen": 0.35}
    ]


def test_jsonl_preferred_and_plot_written(tmp_path):
    rows = [
        {"step": 5, "loss": 2.5, "score": 2.1, "pen": 0.4, "time": 1.0},
        {"step": 10, "loss": 2.0, "score": 1.7, "pen": 0.3, "time": 2.0},
        {"step": 10, "val_loss": 1.9, "val_score": 1.6, "val_pen": 0.3},
    ]
    (tmp_path / "metrics.jsonl").write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    (tmp_path / "run.log").write_text("decoy — jsonl must win\n")
    hist = load_history(tmp_path)
    assert len(hist["train"]) == 2 and len(hist["val"]) == 1

    main(["--experiment_path", str(tmp_path)])
    assert (tmp_path / "loss_curves.png").stat().st_size > 0


def test_run_log_fallback_and_explicit_output(tmp_path):
    (tmp_path / "run.log").write_text(REFERENCE_LOG)
    out = tmp_path / "curves.png"
    main(["--experiment_path", str(tmp_path), "--output", str(out)])
    assert out.stat().st_size > 0


def test_plots_the_actual_reference_best_exp_log(tmp_path):
    """The shipped reference training log must parse and plot directly."""
    import pathlib

    ref = pathlib.Path("/root/reference/data/best_exp/run.log")
    if not ref.exists():
        import pytest

        pytest.skip("reference log not mounted")
    main(["--log", str(ref), "--output", str(tmp_path / "ref.png")])
    hist = load_history(log=ref)
    assert len(hist["train"]) == 12000  # 60k steps / log_freq 5
    assert (tmp_path / "ref.png").stat().st_size > 0
