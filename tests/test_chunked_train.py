"""Chunked training execution (Trainer.make_chunk_fn, round 3).

The per-step host loop pays remote-dispatch latency every step (measured
~50 steps/s with ±40% noise on the tunnel vs ~80 stable for a 16-step
lax.scan chunk — PERFORMANCE.md "Round-3"). steps_per_call: auto scans up
to 16 steps per device program, cutting chunks at val/save/termination
boundaries so the host has boundary-step state in hand. These tests pin:

* cadence/label parity with the reference loop arithmetic on the chunked
  path (test_loop_cadence.py covers the per-step path — its profiler
  config forces steps_per_call=1);
* numerical equivalence with the per-step loop (same fold_in(root_key, c)
  key derivation, same step math — scan scheduling only).
"""

import logging
import re

import numpy as np
import pytest

import jax

from dhg.config import DLConfig, fit_config
from dhg.train import Trainer

STEPS, LOG_FREQ, SAVE_FREQ = 12, 5, 5


class _ListHandler(logging.Handler):
    def __init__(self):
        super().__init__()
        self.messages = []

    def emit(self, record):
        self.messages.append(record.getMessage())


def _cfg(tmp_path, **extra):
    over = {
        "training_args.steps": STEPS,
        "training_args.log_freq": LOG_FREQ,
        "training_args.save_freq": SAVE_FREQ,
        "training_args.channels": 32,
        "training_args.att_layers_num": 1,
        "training_args.batch_size": 4,
        "training_args.max_files": 8,
        "training_args.compute_dtype": "float32",
        "experiment.work_dir": str(tmp_path),
        "dataset_args.max_seq_len": 96,
        "dataset_args.max_text_len": 20,
    }
    over.update(extra)
    return DLConfig(fit_config(config="smoke.yml", **over))


def _run(cfg, exp_dir, name):
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    handler = _ListHandler()
    logger.addHandler(handler)
    trainer = Trainer(cfg)
    meta = {"host_name": "t@h", "exp_dir": exp_dir, "run_name": "t"}
    state = trainer.train(meta, logger)
    return state, handler.messages


def _reference_cadence(steps, freq):
    out, count = [], 0
    while True:
        count += 1
        if (count + 1) % freq == 0:
            out.append(count + 1)
        if count >= steps:
            break
    return out


def test_cache_not_embedded_in_program(tmp_path):
    """Dataset arrays must enter the jitted step as ARGUMENTS, not closure
    constants: closed-over arrays serialize into the HLO, and a real-scale
    cache blows past the remote-compile service's request-size limit
    (HTTP 413 measured at max_files=4096 synthetic, round 3 — style alone
    is N x 14 x 1280 f32). With a 64-sample cache (~4.6 MB of style), an
    embedded-literal program would stringify to tens of MB; the
    argument-passing program stays well under 3 MB."""
    cfg = _cfg(tmp_path, **{"training_args.max_files": 64})
    t = Trainer(cfg)
    data = t.load_dataset()
    step = jax.jit(t._build_step(), donate_argnums=(0,))
    state = t.init_state(0)
    text = step.lower(state, jax.random.PRNGKey(0), data.arrays).as_text()
    assert len(text) < 3_000_000, f"step program is {len(text)} bytes — cache embedded?"


def test_chunked_cadence_matches_reference(tmp_path):
    """steps_per_call=auto (the default) must emit exactly the reference's
    log/checkpoint cadence: chunk ends align with save boundaries, log
    lines come from the stacked per-step metrics."""
    exp_dir = tmp_path / "run"
    exp_dir.mkdir()
    state, messages = _run(_cfg(tmp_path), exp_dir, "chunk_cadence")

    got_logs = [
        int(m.group(1)) for msg in messages if (m := re.match(r"Step (\d+) \| Loss", msg))
    ]
    assert got_logs == _reference_cadence(STEPS, LOG_FREQ), got_logs

    pattern = (
        r"^Step \d+ \| Loss: \d+\.\d{3} \| Score: \d+\.\d{3} \| "
        r"Pen: \d+\.\d{3} \| Time: \d+\.\d{3} sec$"
    )
    for line in (m for m in messages if m.startswith("Step ")):
        assert re.match(pattern, line), line

    got_saves = sorted(
        int(p.name.split("_")[1]) for p in exp_dir.glob("checkpoint_[0-9]*") if p.is_dir()
    )
    assert got_saves == _reference_cadence(STEPS, SAVE_FREQ), got_saves
    assert (exp_dir / "model_final").exists()


def test_chunked_equals_per_step(tmp_path):
    """Final params and per-log losses must match the per-step loop: the
    chunk scans the SAME step fn with the SAME fold_in(root_key, c) keys —
    only XLA scheduling differs (f32 tolerance, not bitwise)."""
    d1, d2 = tmp_path / "a", tmp_path / "b"
    d1.mkdir(), d2.mkdir()
    s_chunk, m_chunk = _run(_cfg(tmp_path), d1, "eq_chunk")
    s_step, m_step = _run(
        _cfg(tmp_path, **{"training_args.steps_per_call": 1}), d2, "eq_step"
    )

    def losses(msgs):
        return [
            float(m.group(1))
            for msg in msgs
            if (m := re.search(r"\| Loss: (\d+\.\d{3})", msg))
        ]

    np.testing.assert_allclose(losses(m_chunk), losses(m_step), atol=2e-3)
    for a, b in zip(jax.tree.leaves(s_chunk.params), jax.tree.leaves(s_step.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )
    assert int(s_chunk.step) == int(s_step.step) == STEPS
