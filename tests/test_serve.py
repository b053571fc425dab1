"""Serving runtime: HTTP generate endpoint over a live server."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dhg.models.denoiser import DiffusionModel
from dhg.serve import GenerationService, serve


@pytest.fixture(scope="module")
def server():
    model = DiffusionModel(num_layers=1, c1=32, c2=48, c3=64)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 24, 2)),
        jnp.zeros((1, 50), jnp.int32),
        jnp.ones((1, 1)),
        jnp.zeros((1, 14, 1280)),
    )["params"]
    # Two-entry style bank: entry 0 (zeros) is the default — existing tests
    # see the pre-bank behavior; entry 1 exercises per-request selection.
    bank = jnp.stack([jnp.zeros((14, 1280)), jnp.full((14, 1280), 0.1)])
    service = GenerationService(model, params, bank)
    # port 0: ephemeral. warm_steps=(30,) also warms + allowlists the
    # 30-step strided programs (fewer-step serving tests below).
    # warm_temps=(0.5,) also warms + allowlists the tau=0.5 programs
    # (temperature serving tests below).
    httpd = serve(service, port=0, warmup_buckets=[104], warm_steps=(30,),
                  warm_temps=(0.5,))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), headers={"Content-Type": "application/json"}
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        body = json.loads(r.read())
    assert body["ok"] is True
    assert body["buckets"] == [104]
    assert body["styles"] == 2  # the fixture's two-entry bank


def test_style_bank_selection_and_blend(server):
    """Per-request style: index selects a bank entry, a weight vector
    blends entries, and all variants share the warmed programs (none of
    these requests may compile — they ride the same bucket/batch grid)."""
    base = {"prompt": "abc", "seed": 7}
    s0, b_default = _post(server + "/generate", base)
    s1, b_idx0 = _post(server + "/generate", {**base, "style": 0})
    s2, b_idx1 = _post(server + "/generate", {**base, "style": 1})
    s3, b_blend = _post(server + "/generate", {**base, "style": [0.5, 0.5]})
    assert s0 == s1 == s2 == s3 == 200
    # Explicit index 0 == default (omitted) style.
    assert b_idx0["strokes"] == b_default["strokes"]
    # A different bank entry and a blend both change the conditioning.
    assert b_idx1["strokes"] != b_default["strokes"]
    assert b_blend["strokes"] != b_default["strokes"]
    assert b_blend["strokes"] != b_idx1["strokes"]
    # Weight vector [1, 0] == index 0 exactly (same program, same math).
    s4, b_w0 = _post(server + "/generate", {**base, "style": [1.0, 0.0]})
    assert s4 == 200
    np.testing.assert_allclose(
        np.asarray(b_w0["strokes"]), np.asarray(b_default["strokes"]), atol=1e-4
    )


def test_style_bank_validation_400(server):
    for bad, msg in [
        (2, "out of range"),
        (-1, "out of range"),
        ([1.0], "one entry per bank style"),
        ([1.0, 2.0, 3.0], "one entry per bank style"),
        (["a", "b"], "numbers"),
        (True, "int index or a list"),
        ("first", "int index or a list"),
    ]:
        status, body = _post(server + "/generate", {"prompt": "ab", "style": bad})
        assert status == 400, bad
        assert msg in body["error"], bad


def test_generate_roundtrip(server):
    status, body = _post(server + "/generate", {"prompt": "hello", "seed": 3})
    assert status == 200
    strokes = np.asarray(body["strokes"])
    # "hello" -> 6 tokens -> trim length 104 (= warmed bucket).
    assert strokes.shape == (104, 3)
    assert np.all(np.isfinite(strokes))
    assert body["seq_len"] == 104
    assert body["ms"] > 0


def test_generate_deterministic_by_seed(server):
    s1, b1 = _post(server + "/generate", {"prompt": "abc", "seed": 7})
    s2, b2 = _post(server + "/generate", {"prompt": "abc", "seed": 7})
    assert s1 == s2 == 200
    assert b1["strokes"] == b2["strokes"]


def test_generate_missing_prompt_400(server):
    status, body = _post(server + "/generate", {"seed": 1})
    assert status == 400
    assert "prompt" in body["error"]


def test_generate_overlong_prompt_400(server):
    status, body = _post(server + "/generate", {"prompt": "x" * 200})
    assert status == 400
    assert "too long" in body["error"]


def test_long_prompt_clamps_to_warmed_bucket(server):
    """A prompt longer than every warmed bucket clamps to the largest
    warmed one (no mid-request compile; round-2 verdict #6): 30 chars ->
    31 tokens -> exact seq_len 504, served at the warmed 104 bucket."""
    status, body = _post(server + "/generate", {"prompt": "a" * 30, "seed": 2})
    assert status == 200
    assert body["seq_len"] == 104
    assert np.asarray(body["strokes"]).shape == (104, 3)
    assert body["truncated"] is True  # capped output is flagged, not silent


def test_in_bucket_prompt_not_truncated(server):
    status, body = _post(server + "/generate", {"prompt": "ab", "seed": 2})
    assert status == 200
    assert body["truncated"] is False


def test_warmup_runs_on_batcher_thread_and_resets_stats(server):
    """warmup() must exercise the LIVE path — batcher thread, grouping,
    padding — not call the sampler from the main thread: the first
    dispatch from a fresh thread pays a thread-affinity cost that
    measured 10.5 s for the first live batch of a TPU server warmed from
    the main thread (round 3, PERFORMANCE.md serving section). Contract
    pinned here: warmup traffic is not serving traffic (stats reset to
    zero) and the observability fields exist for /healthz consumers."""
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        stats = json.loads(r.read())["stats"]
    for field in ("last_batch_ms", "max_batch_ms", "slow_batches"):
        assert field in stats, stats
    # Warmup ran 2 modes x 2 steps x 5 batch sizes (31 requests per
    # mode/steps combo = 124 total) through the queue before any test
    # request; if those leaked into stats, requests would be >= 124
    # already. (Other tests in this module run first — bound rather than
    # pin. slow_batches is deliberately NOT asserted zero: a loaded CI
    # host can push a warm CPU batch past slow_ms.)
    assert stats["requests"] < 30


def test_standard_mode_is_warmed(server):
    """warmup() precompiles BOTH diffusion modes by default; a standard-mode
    request must succeed (and not head-of-line-block on a fresh compile)."""
    status, body = _post(
        server + "/generate", {"prompt": "abc", "diffusion_mode": "standard", "seed": 4}
    )
    assert status == 200
    assert np.all(np.isfinite(np.asarray(body["strokes"])))


def test_guided_requests_work_at_any_scale(server):
    """guidance_scale is traced (one program for all scales); different
    scales produce different strokes."""
    s1, b1 = _post(server + "/generate", {"prompt": "abc", "guidance_scale": 1.5, "seed": 5})
    s2, b2 = _post(server + "/generate", {"prompt": "abc", "guidance_scale": 4.0, "seed": 5})
    assert s1 == s2 == 200
    assert b1["strokes"] != b2["strokes"]


def test_healthz_reports_warm_steps(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        body = json.loads(r.read())
    assert body["warm_steps"] == [30]


def test_fewer_step_request_served_when_warmed(server):
    """n_steps=30 was warmed: the request runs the 30-call strided program
    and its trajectory genuinely differs from the 60-step default."""
    s60, b60 = _post(server + "/generate", {"prompt": "abc", "seed": 21})
    s30, b30 = _post(server + "/generate", {"prompt": "abc", "seed": 21, "n_steps": 30})
    assert s60 == s30 == 200
    strokes = np.asarray(b30["strokes"])
    # "abc" -> 4 tokens -> trim length 72 (16*4+8), same as the 60-step path.
    assert strokes.shape == np.asarray(b60["strokes"]).shape == (72, 3)
    assert np.all(np.isfinite(strokes))
    assert b30["strokes"] != b60["strokes"]


def test_canonical_n_steps_always_allowed(server):
    """n_steps=60 normalizes to the default schedule (bit-identical strokes,
    same compiled program) without needing to be in the warm list."""
    _, b_default = _post(server + "/generate", {"prompt": "abc", "seed": 22})
    status, b60 = _post(server + "/generate", {"prompt": "abc", "seed": 22, "n_steps": 60})
    assert status == 200
    assert b60["strokes"] == b_default["strokes"]


def test_unwarmed_mode_rejected_400(server):
    """diffusion_mode is a STATIC jit arg — an un-warmed mode string would
    compile a fresh program mid-request, so it is rejected up front."""
    status, body = _post(server + "/generate", {"prompt": "abc", "diffusion_mode": "ddim"})
    assert status == 400
    assert "not warmed" in body["error"]


def test_unwarmed_n_steps_rejected_400(server):
    """The no-live-compile guarantee: an n_steps outside the warmed
    allowlist is rejected up front, never head-of-line-blocking the
    batcher with a fresh compile."""
    status, body = _post(server + "/generate", {"prompt": "abc", "n_steps": 15})
    assert status == 400
    assert "not warmed" in body["error"]


def test_healthz_reports_warm_temps(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        body = json.loads(r.read())
    assert body["warm_temps"] == [0.5, 1.0]


def test_temperature_request_served_when_warmed(server):
    """tau=0.5 was warmed: the request samples with scaled noise and its
    strokes genuinely differ from (and are tighter than) the tau=1 default."""
    s1, b1 = _post(server + "/generate", {"prompt": "abc", "seed": 31})
    s2, b2 = _post(server + "/generate", {"prompt": "abc", "seed": 31, "temperature": 0.5})
    assert s1 == s2 == 200
    hot, cool = np.asarray(b1["strokes"]), np.asarray(b2["strokes"])
    assert hot.shape == cool.shape == (72, 3)
    assert b1["strokes"] != b2["strokes"]
    assert cool[:, :2].std() < hot[:, :2].std()


def test_temperature_one_always_allowed_and_identical(server):
    """temperature=1.0 normalizes to the default program — bit-identical
    strokes without needing to be warmed."""
    _, b_default = _post(server + "/generate", {"prompt": "abc", "seed": 32})
    status, b1 = _post(server + "/generate", {"prompt": "abc", "seed": 32, "temperature": 1.0})
    assert status == 200
    assert b1["strokes"] == b_default["strokes"]


def test_unwarmed_temperature_rejected_400(server):
    """Temperature is a STATIC jit arg — an un-warmed value would compile a
    fresh program mid-request, so it is rejected up front."""
    status, body = _post(server + "/generate", {"prompt": "abc", "temperature": 2.0})
    assert status == 400
    assert "not warmed" in body["error"]


def test_wrap_paragraph_request(server):
    """"wrap": N samples a word-wrapped paragraph through the queue and
    returns ONE composed page; sibling lines draw independent noise."""
    status, body = _post(
        server + "/generate", {"prompt": "ab cd ef", "seed": 11, "wrap": 5}
    )
    assert status == 200
    assert body["lines"] == 2  # "ab cd" / "ef"
    page = np.asarray(body["strokes"])
    assert page.ndim == 2 and page.shape[1] == 3
    assert np.all(np.isfinite(page))
    # Reproducible from the base seed.
    status2, body2 = _post(
        server + "/generate", {"prompt": "ab cd ef", "seed": 11, "wrap": 5}
    )
    assert status2 == 200 and body2["strokes"] == body["strokes"]
    # Identical line text on different page rows gets DIFFERENT noise
    # (seed + i per line): row 0 samples "ab" with seed 11 and row 1 with
    # seed 12, so the page must equal compose_lines of those two SOLO
    # requests — and the two solo lines must genuinely differ.
    from dhg.utils.vis import compose_lines

    status3, body3 = _post(
        server + "/generate", {"prompt": "ab ab", "seed": 11, "wrap": 2}
    )
    assert status3 == 200 and body3["lines"] == 2
    s_a, solo_11 = _post(server + "/generate", {"prompt": "ab", "seed": 11})
    s_b, solo_12 = _post(server + "/generate", {"prompt": "ab", "seed": 12})
    assert s_a == s_b == 200
    assert solo_11["strokes"] != solo_12["strokes"], (
        "per-line seeds regressed: rows with identical text drew the same noise"
    )
    expected_page = compose_lines(
        [np.asarray(solo_11["strokes"]), np.asarray(solo_12["strokes"])]
    )
    # atol absorbs the JSON float round-trip (~3.5e-5 observed: solo
    # responses re-compose from already-serialized floats); a per-line seed
    # regression would differ by O(1) stroke units.
    np.testing.assert_allclose(
        np.asarray(body3["strokes"]), expected_page, rtol=0, atol=1e-3
    )


def test_wrap_validation_400(server):
    # wrap + EOS must fit the model's max_text_len (50 in the fixture).
    status, body = _post(
        server + "/generate", {"prompt": "hello", "wrap": 50}
    )
    assert status == 400 and "max_text_len" in body["error"]
    # Paragraph mode caps the page: a prompt that wraps into more lines
    # than max_page_lines is rejected up front instead of enqueueing
    # hundreds of line jobs that would head-of-line-block other clients.
    status, body = _post(
        server + "/generate", {"prompt": "a " * 200, "wrap": 1}
    )
    assert status == 400 and "max_page_lines" in body["error"]
    status, body = _post(
        server + "/generate", {"prompt": "hi", "wrap": 5, "align": "justify"}
    )
    assert status == 400 and "align" in body["error"]


def test_unknown_route_404(server):
    status, _ = _post(server + "/nope", {})
    assert status == 404


def test_concurrent_requests_are_batched(server):
    """8 concurrent clients must share sampler calls: the batcher groups
    compatible requests into one bucketed program instead of serializing 8."""
    import urllib.request as _u

    with _u.urlopen(server + "/healthz", timeout=30) as r:
        before = json.loads(r.read())["stats"]

    results = {}

    def fire(i):
        results[i] = _post(server + "/generate", {"prompt": f"line {i}", "seed": i})

    threads = [threading.Thread(target=fire, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(results[i][0] == 200 for i in range(8))

    with _u.urlopen(server + "/healthz", timeout=30) as r:
        after = json.loads(r.read())["stats"]
    new_requests = after["requests"] - before["requests"]
    new_batches = after["batches"] - before["batches"]
    assert new_requests == 8
    assert new_batches < 8, (new_batches, "no batching happened")
    assert after["largest_batch"] >= 2


def test_batched_result_identical_to_solo(server):
    """Continuous-batching determinism contract: a request consumes the SAME
    per-request noise stream whether it runs alone or co-batched, so its
    strokes agree to float32 tolerance. (Bitwise equality across batch sizes
    is impossible under XLA: reductions re-tile per compiled shape, and the
    ~1e-7 reassociation drift compounds over the 60-step scan to ~1e-5 —
    same-seed SOLO replays remain bit-identical, see
    test_generate_deterministic_by_seed.)"""
    # Solo run (server is idle between tests).
    status, solo = _post(server + "/generate", {"prompt": "abc", "seed": 11})
    assert status == 200

    results = {}

    def fire(i, prompt, seed):
        results[i] = _post(server + "/generate", {"prompt": prompt, "seed": seed})

    threads = [
        threading.Thread(target=fire, args=(0, "abc", 11)),
        threading.Thread(target=fire, args=(1, "other words", 5)),
        threading.Thread(target=fire, args=(2, "zzz", 9)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results[0][0] == 200
    got = np.asarray(results[0][1]["strokes"])
    want = np.asarray(solo["strokes"])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


# -- graceful shutdown ---------------------------------------------------------


def _tiny_service():
    model = DiffusionModel(num_layers=1, c1=32, c2=48, c3=64)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 24, 2)),
        jnp.zeros((1, 50), jnp.int32),
        jnp.ones((1, 1)),
        jnp.zeros((1, 14, 1280)),
    )["params"]
    return GenerationService(model, params, jnp.zeros((1, 14, 1280)))


def test_shutdown_drains_inflight_then_refuses():
    """shutdown() finishes every accepted request, then rejects new ones
    and stops the batcher thread."""
    import time

    from dhg.serve import Draining

    service = _tiny_service()
    results, errors = [], []

    def worker(seed):
        try:
            out, _, _, _ = service.generate_line("ab", seed=seed)
            results.append(out)
        except Exception as e:  # pragma: no cover - failure diagnostics
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    # Requests enqueue under the service lock BEFORE blocking, so once the
    # stats show 4 every one of them is queued or in flight.
    deadline = time.time() + 60
    while service.stats_snapshot()["requests"] < 4 and time.time() < deadline:
        time.sleep(0.01)
    service.shutdown(timeout=600)
    for t in threads:
        t.join(timeout=120)
    assert not errors
    assert len(results) == 4
    assert all(np.all(np.isfinite(np.asarray(r))) for r in results)
    assert not service._batcher.is_alive()
    with pytest.raises(Draining, match="draining"):
        service.generate_line("ab", seed=9)
    service.shutdown()  # idempotent


def test_http_503_when_draining():
    """The HTTP layer maps Draining to 503 for requests during drain."""
    service = _tiny_service()
    httpd = serve(service, port=0, warmup_buckets=[])  # no warmup compiles
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        service.shutdown(timeout=10)  # empty queue: immediate
        status, body = _post(url + "/generate", {"prompt": "ab", "seed": 1})
        assert status == 503
        assert "draining" in body["error"]
        # health endpoint still answers during/after drain
        with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
            assert json.loads(r.read())["ok"] is True
    finally:
        httpd.shutdown()


def test_serve_cli_sigterm_drains_and_exits(tmp_path):
    """The real `python -m dhg.serve` process (detached: SIGINT ignored)
    must drain and exit cleanly on SIGTERM — what cluster preemption
    sends. Mirrors the dhg.train interrupt test's wrapper trick to force
    the CPU backend in the subprocess (env vars are dead, DEVNOTES.md)."""
    import os
    import re
    import signal
    import subprocess
    import sys
    import time

    from dhg.checkpoint import save_checkpoint
    from dhg.config import DLConfig, fit_config

    exp_dir = tmp_path / "exp"
    cfg = DLConfig(
        fit_config(
            config="smoke.yml",
            **{
                "training_args.channels": 32,
                "training_args.att_layers_num": 1,
                "dataset_args.max_seq_len": 96,
                "dataset_args.max_text_len": 20,
            },
        )
    )
    model = DiffusionModel(num_layers=1, c1=32, c2=48, c3=64)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 24, 2)),
        jnp.zeros((1, 20), jnp.int32),
        jnp.ones((1, 1)),
        jnp.zeros((1, 14, 1280)),
    )["params"]
    save_checkpoint(exp_dir / "model_final", params)
    cfg.dump(exp_dir / "config.yml")

    wrapper = tmp_path / "serve_cpu.py"
    wrapper.write_text(
        "import os, sys\n"
        "sys.path.insert(0, os.getcwd())\n"
        "import jax\n"
        'jax.config.update("jax_platforms", "cpu")\n'
        "import runpy\n"
        "sys.argv = sys.argv[1:]\n"
        'runpy.run_module("dhg.serve", run_name="__main__")\n'
    )
    out_path = tmp_path / "serve_out.log"
    with open(out_path, "wb") as out:
        proc = subprocess.Popen(
            [
                sys.executable,
                "-u",
                str(wrapper),
                "dhg.serve",
                f"--experiment_path={exp_dir}",
                "--port=0",
                "--warmup_buckets=",  # skip warmup compiles (smoke path)
            ],
            env=dict(os.environ),
            preexec_fn=lambda: signal.signal(signal.SIGINT, signal.SIG_IGN),
            stdout=out,
            stderr=subprocess.STDOUT,
            cwd=os.getcwd(),
        )
    try:
        deadline = time.time() + 300
        port = None
        while time.time() < deadline:
            m = re.search(rb"dhg serving on 127\.0\.0\.1:(\d+)", out_path.read_bytes())
            if m:
                port = int(m.group(1))
                break
            assert proc.poll() is None, out_path.read_text()
            time.sleep(0.5)
        assert port, "server never announced its port"
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.loads(r.read())["ok"] is True
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=120)
        assert proc.returncode == 0, out_path.read_text()
        assert b"stopped (drained)" in out_path.read_bytes()
    finally:
        if proc.poll() is None:
            proc.kill()


def test_max_batch_scales_batch_size_grid():
    """--max_batch widens the co-batch grid (powers of two up to the cap);
    warmup + padding then use the same instance grid, so a 64-cap server
    warms and serves batch-32/64 programs toward the chip's batch-256
    sweet spot (PERFORMANCE.md)."""
    import pytest

    from dhg.models.denoiser import DiffusionModel

    model = DiffusionModel(num_layers=1, c1=32, c2=48, c3=64)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 24, 2)),
        jnp.zeros((1, 50), jnp.int32),
        jnp.ones((1, 1)),
        jnp.zeros((1, 14, 1280)),
    )["params"]
    svc = GenerationService(model, params, jnp.zeros((1, 14, 1280)), max_batch=64)
    assert svc.batch_sizes == (1, 2, 4, 8, 16, 32, 64)
    assert svc._pad_batch_size(17) == 32
    assert svc._pad_batch_size(33) == 64
    assert svc._pad_batch_size(64) == 64
    svc.shutdown(timeout=5)

    with pytest.raises(ValueError, match="max_batch"):
        GenerationService(model, params, jnp.zeros((1, 14, 1280)), max_batch=24)
