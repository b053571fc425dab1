"""Stage-level cost attribution for the 60-step sampler (VERDICT #3 work).

    python -m dhg.tools.profile_stages [--batch=96] [--prompt_len=24]

The sampler's denoise step is a U-Net whose lower stages run at tiny
shapes (T/8 = 49, C = 384 at batch 96); XLA cost analysis says the whole
program is ~2-4% of v5e peak, i.e. per-op latency dominated. This tool
measures WHERE the per-step milliseconds actually go by timing 60-iteration
lax.scan programs whose body is one pyramid stage each (same sequential
structure as the real sampler, so dispatch/pipeline effects are captured):

  enc1      ConvBlock @ T,   c1
  enc2+3    ConvBlock + EncoderLayer @ T/2, c2
  enc4+5    ConvBlock + EncoderLayer @ T/4, c3
  att       att_dense + N x EncoderLayer @ T/8, 384
  dec3+2+1  three ConvBlocks + skip convs + upsamples @ T/4..T
  full      the real denoise body (reference wiring)

'full - sum(stages)' approximates the remaining glue (pools, heads,
residual adds). Timings are D2H-fenced (DEVNOTES.md). Results feed the
megakernel decision + roofline writeup in PERFORMANCE.md.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dhg.models.denoiser import DiffusionModel
from dhg.ops.basic import create_padding_mask
from dhg.ops.conv import avg_pool_1d, upsample_nearest_1d

N_STEPS = 60


def _timed_scan(body, x0, iters=5):
    @jax.jit
    def run(x):
        out, _ = jax.lax.scan(lambda c, _: (body(c), 0.0), x, None, length=N_STEPS)
        # Reduce to ONE scalar before the D2H fence: the axon tunnel is slow,
        # so fetching a multi-MB carry would dominate the measurement.
        return out.astype(jnp.float32).mean()

    run(x0)  # compile
    np.asarray(run(x0))  # warm + fence
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(run(x0))
        times.append(time.perf_counter() - t0)
    return min(times) / N_STEPS  # seconds per step


def profile(batch: int = 96, prompt_len: int = 24, dtype=jnp.bfloat16):
    from dhg.core.sampling import infer_seq_len

    seq_len = infer_seq_len(prompt_len)
    model = DiffusionModel(num_layers=2, dtype=dtype)
    c1, c2, c3 = model.c1, model.c2, model.c3

    key = jax.random.PRNGKey(0)
    text = jax.random.randint(jax.random.PRNGKey(1), (batch, 50), 1, 73)
    style = jax.random.normal(jax.random.PRNGKey(2), (batch, 14, 1280))
    params = model.init(
        key, jnp.zeros((1, seq_len, 2)), text[:1], jnp.ones((1, 1)), style[:1]
    )["params"]

    # x_t-independent conditioning, fixed across timed iterations.
    sig = jnp.full((batch, 1), 0.7)
    sig_emb = model.apply({"params": params}, sig, method=DiffusionModel.embed_sigma)
    cond = model.apply(
        {"params": params}, text, style, sig_emb, method=DiffusionModel.encode_cond
    )
    mask = create_padding_mask(text)

    def apply(fn, *args):
        return model.apply({"params": params}, *args, method=fn)

    cdt = dtype or jnp.float32
    results: dict[str, float] = {}

    # -- full denoise body (baseline) ----------------------------------------
    def full_body(x):
        eps, _pen = apply(DiffusionModel.denoise, x, cond, sig_emb, mask)
        return (0.99 * x - 0.01 * eps).astype(x.dtype)

    results["full"] = _timed_scan(full_body, jnp.zeros((batch, seq_len, 2), jnp.float32))

    # -- enc1 @ T, c1 ---------------------------------------------------------
    def enc1_body(x):
        def run(m, h):
            return m.enc1(h, sig_emb, True)

        return 0.99 * model.apply({"params": params}, x, method=run)

    results["enc1"] = _timed_scan(enc1_body, jnp.zeros((batch, seq_len, c1), cdt))

    # -- enc2 + enc3 @ T/2, c2 ------------------------------------------------
    def enc23_body(x):
        def run(m, h):
            h = m.enc2(h, sig_emb, True)
            return m.enc3(h, cond, sig_emb, mask, True)

        out = model.apply({"params": params}, x, method=run)
        return 0.99 * out[..., :c1]

    results["enc2_enc3"] = _timed_scan(
        enc23_body, jnp.zeros((batch, seq_len // 2, c1), cdt)
    )

    # -- enc4 + enc5 @ T/4, c3 ------------------------------------------------
    def enc45_body(x):
        def run(m, h):
            h = m.enc4(h, sig_emb, True)
            return m.enc5(h, cond, sig_emb, mask, True)

        out = model.apply({"params": params}, x, method=run)
        return 0.99 * out[..., :c2]

    results["enc4_enc5"] = _timed_scan(
        enc45_body, jnp.zeros((batch, seq_len // 4, c2), cdt)
    )

    # -- attention bottleneck @ T/8, 2*c2 --------------------------------------
    def att_body(x):
        def run(m, h):
            h = m.att_dense(h)
            for layer in m.att_layers:
                h = layer(h, cond, sig_emb, mask, True)
            return h

        out = model.apply({"params": params}, x, method=run)
        return 0.99 * out[..., :c3]

    results["att_stack"] = _timed_scan(
        att_body, jnp.zeros((batch, seq_len // 8, c3), cdt)
    )

    # -- decoder (skip convs + upsamples + dec3/2/1) @ T/4..T ------------------
    h1 = jnp.zeros((batch, seq_len, c1), cdt)
    h2 = jnp.zeros((batch, seq_len // 2, c2), cdt)
    h3 = jnp.zeros((batch, seq_len // 4, c3), cdt)

    def dec_body(x):
        def run(m, xb):
            h = upsample_nearest_1d(xb) + m.skip_conv3(h3)
            h = m.dec3(h, sig_emb, True)
            h = upsample_nearest_1d(h) + m.skip_conv2(h2)
            h = m.dec2(h, sig_emb, True)
            h = upsample_nearest_1d(h) + m.skip_conv1(h1)
            h = m.dec1(h, sig_emb, True)
            return h

        out = model.apply({"params": params}, x, method=run)
        pooled = avg_pool_1d(avg_pool_1d(avg_pool_1d(out)))  # [B, T/8, c1]
        return 0.99 * jnp.tile(pooled, (1, 1, (2 * c2) // c1))  # back to 2*c2

    results["decoder"] = _timed_scan(
        dec_body, jnp.zeros((batch, seq_len // 8, 2 * c2), cdt)
    )

    staged = sum(v for k, v in results.items() if k != "full")
    report = {
        "batch": batch,
        "seq_len": seq_len,
        "backend": jax.default_backend(),
        "ms_per_step": {k: round(v * 1e3, 4) for k, v in results.items()},
        "stage_sum_ms": round(staged * 1e3, 4),
        "glue_ms": round((results["full"] - staged) * 1e3, 4),
        "pct_of_full": {
            k: round(100 * v / results["full"], 1)
            for k, v in results.items()
            if k != "full"
        },
    }
    return report


def main(argv=None):
    from dhg.config import parse_cli_kwargs

    kw = parse_cli_kwargs(argv if argv is not None else sys.argv[1:], help_text=__doc__)
    report = profile(
        batch=int(kw.get("batch", 96)), prompt_len=int(kw.get("prompt_len", 24))
    )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
