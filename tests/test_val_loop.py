"""Periodic validation evaluation inside the training loop."""

import logging

import pytest

from dhg.config import DLConfig, fit_config
from dhg.train import Trainer


def test_val_eval_logged(tmp_path, caplog):
    cfg = DLConfig(
        fit_config(
            config="smoke.yml",
            **{
                "experiment.work_dir": str(tmp_path),
                "training_args.steps": 6,
                "training_args.channels": 32,
                "training_args.att_layers_num": 1,
                "training_args.batch_size": 4,
                "training_args.max_files": 8,
                "training_args.compute_dtype": "float32",
                "training_args.log_freq": 100,
                "training_args.save_freq": 100,
                "training_args.val_freq": 3,
                "dataset_args.max_seq_len": 96,
                "dataset_args.max_text_len": 20,
            },
        )
    )
    t = Trainer(cfg)
    logger = logging.getLogger("test_val")
    logger.setLevel(logging.INFO)
    records = []

    class Capture(logging.Handler):
        def emit(self, r):
            records.append(r.getMessage())

    logger.addHandler(Capture())
    meta = {"host_name": "test", "exp_dir": tmp_path, "run_name": "t"}
    t.train(meta, logger)
    val_lines = [m for m in records if "Val Loss" in m]
    assert len(val_lines) >= 1
    assert "Val Score" in val_lines[0] and "Val Pen" in val_lines[0]


def test_val_eval_fn_cached_no_recompile(tmp_path):
    """The Trainer builds the jitted eval fn ONCE (round-2 verdict #5): after
    multiple validation boundaries its jit cache holds exactly one entry per
    distinct batch shape — a fresh closure per boundary would recompile every
    val_freq steps."""
    cfg = DLConfig(
        fit_config(
            config="smoke.yml",
            **{
                "experiment.work_dir": str(tmp_path),
                "training_args.steps": 9,
                "training_args.channels": 32,
                "training_args.att_layers_num": 1,
                "training_args.batch_size": 4,
                "training_args.max_files": 8,
                "training_args.compute_dtype": "float32",
                "training_args.log_freq": 100,
                "training_args.save_freq": 100,
                "training_args.val_freq": 3,
                "dataset_args.max_seq_len": 96,
                "dataset_args.max_text_len": 20,
            },
        )
    )
    t = Trainer(cfg)
    logger = logging.getLogger("test_val_cached")
    meta = {"host_name": "test", "exp_dir": tmp_path, "run_name": "t"}
    t.train(meta, logger)  # 3 validation boundaries (steps 3, 6, 9)
    eval_step = t.eval_fn()
    assert eval_step is t.eval_fn(), "eval fn must be cached on the Trainer"
    # val cache = 16 samples, batch 4 -> one shape (no tail): exactly 1 compile.
    assert eval_step._cache_size() == 1, eval_step._cache_size()


def test_val_disabled_by_default(tmp_path):
    cfg = DLConfig(
        fit_config(
            config="smoke.yml",
            **{
                "training_args.channels": 32,
                "training_args.att_layers_num": 1,
                "dataset_args.max_seq_len": 96,
            },
        )
    )
    t = Trainer(cfg)
    assert t.load_val_dataset() is None
