"""bench.py driver-contract tests (round 5).

The round-4 driver run produced no JSON at all (rc=124: sequential remote
compiles outgrew the driver's ~15-min budget). bench.py now assembles its
one JSON line incrementally and emits it on completion, internal deadline,
or SIGTERM — these tests pin that contract without touching a TPU:

  * assemble() is always JSON-serializable, with nulls (not crashes) for
    anything unmeasured;
  * derived fields (vs_baseline, vs_cpu_x, p50 decomposition) appear as
    soon as their inputs exist and are arithmetically right;
  * emit() prints exactly once no matter how many paths race to it.
"""

from __future__ import annotations

import json

import pytest

import bench


@pytest.fixture(autouse=True)
def fresh_bench_state():
    saved = dict(bench.RESULT)
    bench.RESULT.clear()
    bench._EMITTED.clear()
    yield
    bench.RESULT.clear()
    bench.RESULT.update(saved)
    bench._EMITTED.clear()


REQUIRED_KEYS = {
    "metric",
    "value",
    "unit",
    "vs_baseline",
    "p50_line_latency_s",
    "tunnel_rtt_ms",
    "train_steps_per_sec_batch96",
    "cpu_baseline_line_s",
    "vs_cpu_x",
    "backend",
    "bench_status",
}


def test_assemble_empty_is_serializable():
    out = bench.assemble("partial (test)")
    line = json.dumps(out)  # must not raise
    back = json.loads(line)
    assert REQUIRED_KEYS <= set(back)
    assert back["metric"] == "denoise_steps_per_sec_per_chip"
    assert back["value"] is None
    assert back["vs_baseline"] is None
    assert back["p50_device_only_s"] is None
    # CPU baseline falls back to the recorded measurement, flagged as such.
    assert back["cpu_baseline_line_s"] == bench.REFERENCE_CPU_MEASURED["line_s"]
    assert "recorded" in back["cpu_baseline_source"]
    assert back["bench_status"] == "partial (test)"


def test_assemble_derives_from_partial_measurements():
    bench.put(steps_per_sec=45000.0, p50=0.04, rtt=0.03, seq_len=392)
    out = bench.assemble("complete")
    assert out["value"] == 45000.0
    assert out["vs_baseline"] == round(45000.0 / bench.A100_DENOISE_FWD_EQUIV_PER_SEC, 3)
    assert out["p50_device_only_s"] == pytest.approx(0.01)
    assert out["tunnel_rtt_ms"] == 30.0
    # Without an explicit floor, the median doubles as the floor.
    assert out["tunnel_rtt_floor_ms"] == 30.0
    # vs_cpu_x uses the recorded fallback denominator when the in-run CPU
    # measurement has not landed.
    assert out["vs_cpu_x"] == round(bench.REFERENCE_CPU_MEASURED["line_s"] / 0.04, 1)
    # amortized = sustained lines/s (steps/s / 60) x CPU seconds/line.
    assert out["vs_cpu_amortized_x"] == round(
        45000.0 / bench.N_STEPS * bench.REFERENCE_CPU_MEASURED["line_s"], 1
    )
    # train not measured -> nulls, not crashes
    assert out["train_steps_per_sec_batch96"] is None
    assert out["train_vs_cpu_x"] is None


def test_assemble_decomposes_against_rtt_floor():
    # Tunnel jitter can push the trivial-call MEDIAN above the sampler's own
    # p50 (observed in-run: rtt 44 ms > p50 38.2 ms), which used to clamp
    # p50_device_only_s to a misleading 0.0. The decomposition must use the
    # transport FLOOR instead; the median stays reported as tunnel_rtt_ms.
    bench.put(p50=0.0382, rtt=0.044, rtt_floor=0.026)
    out = bench.assemble("complete")
    assert out["tunnel_rtt_ms"] == 44.0
    assert out["tunnel_rtt_floor_ms"] == 26.0
    assert out["p50_device_only_s"] == pytest.approx(0.0122)


def test_assemble_with_train_and_cpu():
    bench.put(
        steps_per_sec=50000.0,
        p50=0.035,
        rtt=0.03,
        seq_len=392,
        sec_trials=[0.305, 0.306],
        train={"median": 96.9, "trials": [96.9, 96.5], "compute_dtype": "bfloat16"},
        cpu={
            "line_s": 2.4,
            "line_s_in_run": 2.5,
            "train_steps_per_sec": 0.093,
            "source": "measured (test)",
        },
    )
    out = bench.assemble("complete")
    assert out["train_steps_per_sec_batch96"] == 96.9
    assert out["train_vs_a100_10.4"] == round(96.9 / 10.4, 2)
    assert out["train_mfu"] == round(
        96.9 * bench.TRAIN_FLOPS_PER_STEP_B96 / bench.V5E_BF16_PEAK_FLOPS, 4
    )
    assert out["vs_cpu_x"] == round(2.4 / 0.035, 1)
    assert out["train_vs_cpu_x"] == round(96.9 / 0.093, 1)
    assert out["throughput_trial_ms_per_call"] == [305.0, 306.0]
    json.dumps(out)


def test_emit_is_once_only(capsys):
    bench.put(steps_per_sec=1000.0)
    bench.emit("complete")
    bench.emit("partial (should be ignored)")
    printed = capsys.readouterr().out.strip().splitlines()
    json_lines = [l for l in printed if l.startswith("{")]
    assert len(json_lines) == 1
    assert json.loads(json_lines[0])["bench_status"] == "complete"
