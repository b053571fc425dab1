"""Golden tests: train-loop log/save cadence + format + profiler trace.

The reference loop (train.py:96-133) increments `count` per completed step
and triggers on `(count + 1) % freq == 0` with label `Step {count + 1}` —
i.e. "Step 5" is logged after 4 completed steps, `checkpoint_5` saved after
4 steps, and `model_final` written when `count >= steps`. dhg reproduces
that cadence exactly; these tests pin it by simulating the reference
trigger logic and comparing against a real dhg run's emitted artifacts.
"""

import logging
import re

import numpy as np
import pytest

from dhg.config import DLConfig, fit_config
from dhg.train import Trainer

STEPS, LOG_FREQ, SAVE_FREQ = 12, 5, 5


def _reference_cadence(steps, log_freq, save_freq):
    """Replicate the reference loop's trigger arithmetic (train.py:96-133)."""
    logs, saves = [], []
    count = 0
    while True:
        count += 1  # one completed training step
        if (count + 1) % log_freq == 0:
            logs.append(count + 1)
        if (count + 1) % save_freq == 0:
            saves.append(count + 1)
        if count >= steps:
            break
    return logs, saves


class _ListHandler(logging.Handler):
    def __init__(self):
        super().__init__()
        self.messages = []

    def emit(self, record):
        self.messages.append(record.getMessage())


@pytest.fixture(scope="module")
def train_run(tmp_path_factory):
    exp_dir = tmp_path_factory.mktemp("cadence_run")
    prof_dir = tmp_path_factory.mktemp("trace")
    cfg = DLConfig(
        fit_config(
            config="smoke.yml",
            **{
                "training_args.steps": STEPS,
                "training_args.log_freq": LOG_FREQ,
                "training_args.save_freq": SAVE_FREQ,
                "training_args.channels": 32,
                "training_args.att_layers_num": 1,
                "training_args.batch_size": 4,
                "training_args.max_files": 8,
                "training_args.compute_dtype": "float32",
                "training_args.profile_dir": str(prof_dir),
                "training_args.profile_start": 3,
                "training_args.profile_steps": 2,
                "dataset_args.max_seq_len": 96,
                "dataset_args.max_text_len": 20,
            },
        )
    )
    logger = logging.getLogger("cadence_test")
    logger.setLevel(logging.INFO)
    handler = _ListHandler()
    logger.addHandler(handler)
    trainer = Trainer(cfg)
    meta = {"host_name": "test@host", "exp_dir": exp_dir, "run_name": "t"}
    trainer.train(meta, logger)
    return handler.messages, exp_dir, prof_dir


def test_log_cadence_and_labels_match_reference(train_run):
    messages, _, _ = train_run
    ref_logs, _ = _reference_cadence(STEPS, LOG_FREQ, SAVE_FREQ)
    got = [int(m.group(1)) for msg in messages if (m := re.match(r"Step (\d+) \| Loss", msg))]
    assert got == ref_logs, (got, ref_logs)


def test_log_line_format_matches_reference(train_run):
    """Byte-level format parity with train.py:112-117:
    `Step N | Loss: x.xxx | Score: x.xxx | Pen: x.xxx | Time: t sec`."""
    messages, _, _ = train_run
    pattern = (
        r"^Step \d+ \| Loss: \d+\.\d{3} \| Score: \d+\.\d{3} \| "
        r"Pen: \d+\.\d{3} \| Time: \d+\.\d{3} sec$"
    )
    step_lines = [m for m in messages if m.startswith("Step ")]
    assert step_lines, messages
    for line in step_lines:
        assert re.match(pattern, line), line


def test_checkpoint_cadence_matches_reference(train_run):
    _, exp_dir, _ = train_run
    _, ref_saves = _reference_cadence(STEPS, LOG_FREQ, SAVE_FREQ)
    got = sorted(
        int(p.name.split("_")[1]) for p in exp_dir.glob("checkpoint_[0-9]*") if p.is_dir()
    )
    assert got == ref_saves, (got, ref_saves)
    assert (exp_dir / "model_final").exists()


def test_profiler_trace_written(train_run):
    """training_args.profile_dir must produce a real trace on disk
    (jax.profiler start/stop around steps [profile_start, +profile_steps))."""
    _, _, prof_dir = train_run
    traces = list(prof_dir.rglob("*"))
    assert any(p.is_file() for p in traces), f"no trace files under {prof_dir}"


def test_metrics_jsonl_matches_log_cadence(train_run):
    """metrics.jsonl (observability superset) carries one record per log
    boundary with the same steps/values as the run-log lines."""
    import json

    messages, exp_dir, _ = train_run
    rows = [json.loads(l) for l in (exp_dir / "metrics.jsonl").read_text().splitlines()]
    ref_logs, _ = _reference_cadence(STEPS, LOG_FREQ, SAVE_FREQ)
    assert [r["step"] for r in rows] == ref_logs
    logged = {
        int(m.group(1)): float(m.group(2))
        for msg in messages
        if (m := re.match(r"Step (\d+) \| Loss: (\d+\.\d{3})", msg))
    }
    for r in rows:
        assert np.isclose(r["loss"], logged[r["step"]], atol=5e-4)
        assert set(r) == {"step", "loss", "score", "pen", "time"}


def test_final_loss_values_finite(train_run):
    messages, _, _ = train_run
    losses = [
        float(m.group(1))
        for msg in messages
        if (m := re.search(r"Loss: (\d+\.\d{3})", msg))
    ]
    assert losses and np.all(np.isfinite(losses))
