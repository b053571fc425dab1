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
    service = GenerationService(model, params, jnp.zeros((1, 14, 1280)))
    httpd = serve(service, port=0, warmup_buckets=[104])  # port 0: ephemeral
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


def test_unknown_route_404(server):
    status, _ = _post(server + "/nope", {})
    assert status == 404
