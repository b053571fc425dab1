"""Inference runtime — the 60-step sampler as ONE compiled XLA program.

Parity with the reference CLI (inference.py:19-102):
  * checkpoint resolution from experiment_path: model_final -> model_last ->
    highest-numbered checkpoint_<N>;
  * style vector from the source image via the frozen StyleExtractor;
  * sequence length = 16 * len(tokens), bumped to the next multiple of 8;
  * 60-step reverse loop with sigma = sqrt(alpha_bar_i), "new" (default) or
    "standard" step rule; pen lifts from the last step appended as channel 3;
  * PNG rendered via show_strokes to ./<output>.png.

TPU-native differences: the whole loop is jax.lax.scan inside one jit
(dhg.core.sampling), so a line is a single device program instead of 60
Python-dispatched forwards; sample_lines() samples many prompts of varied
length at once (padded to one bucket); optional guidance_scale and
encoder_reuse knobs extend the reference's sampler.
"""

from __future__ import annotations

import sys
from functools import lru_cache, partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from dhg.checkpoint import load_model, resolve_checkpoint
from dhg.config import parse_cli_kwargs
from dhg.core.sampling import diffusion_sample, infer_seq_len
from dhg.data.tokenizer import Tokenizer
from dhg.utils.vis import compose_lines, save_strokes


def wrap_text(text: str, width: int) -> list[str]:
    """Greedy word-boundary wrap of a paragraph into lines of <= width chars.

    Words longer than width are hard-split; runs of whitespace collapse at
    break points (textwrap semantics). Explicit newlines in the input force
    line breaks, and blank input lines survive as "" entries — they become
    blank page lines under compose_lines (paragraph gaps).
    """
    import textwrap

    if width < 1:
        raise ValueError(f"wrap width must be >= 1, got {width}")
    out: list[str] = []
    for raw in text.splitlines() or [""]:
        if not raw.strip():
            out.append("")
            continue
        out.extend(
            textwrap.wrap(raw, width=width, break_long_words=True, break_on_hyphens=False)
        )
    return out


def make_denoise_fn(model, params, text: jnp.ndarray, style: jnp.ndarray):
    """Close text/style conditioning over the per-step denoiser call
    (naive path: runs the full conditioning encoder every step)."""

    def denoise(x, sigma):
        return model.apply({"params": params}, x, text, sigma, style)

    return denoise


@partial(jax.jit, static_argnums=(0, 3, 4, 7, 9, 11, 12))
def _sample_jit(
    model, params, cond_inputs, batch_size, seq_len, key, beta_set, mode,
    guidance_scale=None, encoder_reuse=None, sample_keys=None, hoist="compact",
    temperature=1.0,
):
    """One XLA program for the whole sampler, with conditioning hoisted.

    sigma depends only on the schedule, so sigma embeddings and the
    TextStyleEncoder memory for ALL steps are computed in one batched pass
    before the scan; the scan body runs only the U-Net. Numerically
    identical to the reference's per-step recompute (inference.py:84-94).

    guidance_scale (optional): classifier-free-style guidance, a capability
    superset of the reference (BASELINE config 5 sweeps it):
    eps = eps_uncond + g * (eps_cond - eps_uncond), with the unconditional
    branch fed all-padding text and zero style. None skips the second
    branch entirely. The scale is a TRACED scalar (not static), so every
    guided request shares ONE compiled program per (batch, seq_len, mode)
    regardless of its scale — callers normalize g == 1.0 to None
    (generate()).

    hoist (static, "full" | "compact"): what is precomputed for all 60
    steps outside the scan.
      * "full" — cross-attention K/V for every layer and step live in HBM
        (~2432 bf16 values per text token per step at the canonical plan:
        2x(192+256+384+384)); the context scales with batch and tips the
        16 GB v5e HBM at batch 512 (round-2 measurement).
      * "compact" (DEFAULT) — only the conditioning memory cond_all
        (384/token/step, ~6.3x smaller) is hoisted, computed sequentially
        per step (lax.map) to bound TextStyleEncoder temporaries; the
        scan body recomputes each step's K/V from its cond slice (a
        handful of [L=50, d] matmuls — tiny vs the U-Net). Same ops as
        the reference's per-step recompute, so parity holds; lets batch
        512+ fit on one chip. Round-3 v5e sweep: compact is FASTER than
        full at every batch (trading tiny MXU recompute for 60 steps of
        hoisted-K/V HBM reads) — see PERFORMANCE.md "Round-3: hoist
        sweep" — hence the default.
    """
    from dhg.core.schedule import get_alpha_set, get_beta_set
    from dhg.models.denoiser import DiffusionModel
    from dhg.ops.basic import create_padding_mask

    text, style = cond_inputs
    if beta_set is None:
        beta_set = get_beta_set()
    alpha_set = get_alpha_set(beta_set)
    n = beta_set.shape[0]
    # x_t carries in f32. (bf16 carry was measured SLOWER and the RNG draws
    # differ by dtype, diverging the whole trajectory — see DEVNOTES.md.)
    x_dtype = jnp.float32

    # Reverse schedule order: scan step t uses schedule index n-1-t.
    # sigma is identical across the batch, so its embedding (and everything
    # derived only from it — FiLM coefficients) is computed at B=1 and
    # broadcast: bit-identical, 1/B the work and memory.
    sig_rev = jnp.sqrt(alpha_set)[::-1]
    sig_b = sig_rev[:, None, None]  # [n, 1, 1]

    sigma_embs = jax.vmap(
        lambda s: model.apply({"params": params}, s, method=DiffusionModel.embed_sigma)
    )(sig_b)  # [n, 1, 32]

    compact = hoist == "compact"

    def encode_all(t, s):
        # sigma-independent half once; only the sigma tail runs per step.
        # Compact mode runs the 60 tails sequentially (lax.map): the vmapped
        # pass materializes every step's TextStyleEncoder attention
        # temporaries ([B, 8, L, 70]) at once, which alone is multi-GB at
        # batch 512.
        pre = model.apply(
            {"params": params}, t, s, method=DiffusionModel.encode_cond_pre
        )

        def tail(se):
            return model.apply(
                {"params": params}, pre, se, method=DiffusionModel.encode_cond_tail
            )

        if not compact:
            return jax.vmap(tail)(sigma_embs)
        # DHG_COND_CHUNK > 1 runs the 60 tails as ceil(60/chunk) sequential
        # chunks of chunk-vmapped work (lax.map batch_size). Measured
        # NEGATIVE at chunk=10 — slower than sequential at every batch
        # (PERFORMANCE.md "Round-3: hoist sweep" finding 5) — so the
        # default stays 1 (fully sequential); the knob remains for A/B.
        # NOTE: read at TRACE time and not part of the jit cache key —
        # changing it mid-process silently reuses the already-compiled
        # program. A/B it across fresh processes (as bench_hoist does).
        import os

        chunk = int(os.environ.get("DHG_COND_CHUNK", "1"))
        if chunk > 1:
            return jax.lax.map(tail, sigma_embs, batch_size=chunk)
        return jax.lax.map(tail, sigma_embs)

    cond_all = encode_all(text, style)
    text_mask = create_padding_mask(text)

    # Hoist the x_t-independent work out of the scan. Full mode additionally
    # precomputes the text side of every cross-attention layer (text
    # projection, LN, affine, PE, K/V head projections) for all 60 steps in
    # one batched pass; the scan body then runs ONLY x_t-dependent work —
    # numerically identical (denoise(kvs=..., films=...) is the same ops in
    # the same order, just scheduled outside the loop). Compact mode keeps
    # only cond_all and rebuilds each step's K/V inside the scan (see the
    # docstring's hoist note).
    def kv_of(cond_t, se_t):
        return model.apply(
            {"params": params}, cond_t, se_t, method=DiffusionModel.precompute_cross_kv
        )

    def kv_all_of(cond_seq):
        return jax.vmap(kv_of, in_axes=(0, 0))(cond_seq, sigma_embs)

    kv_all = None if compact else kv_all_of(cond_all)
    film_all = jax.vmap(
        lambda se: model.apply(
            {"params": params}, se, method=DiffusionModel.precompute_film
        )
    )(sigma_embs)

    guided = guidance_scale is not None

    if encoder_reuse and encoder_reuse > 1:
        # Experimental encoder-feature caching (see
        # dhg.core.sampling.diffusion_sample_encoder_reuse). Exclusive with
        # guidance for now; always runs on the full hoist.
        assert not guided, "encoder_reuse and guidance_scale are mutually exclusive"
        if kv_all is None:
            kv_all = kv_all_of(cond_all)
        from dhg.core.sampling import diffusion_sample_encoder_reuse

        def enc(x, ctx):
            kvs, films = ctx
            return model.apply(
                {"params": params}, x, None, None, text_mask,
                method=DiffusionModel.encode_unet, kvs=kvs, films=films,
            )

        def dec(feats, ctx):
            kvs, films = ctx
            return model.apply(
                {"params": params}, feats, None, None, text_mask,
                method=DiffusionModel.decode_unet, kvs=kvs, films=films,
            )

        return diffusion_sample_encoder_reuse(
            enc,
            dec,
            key,
            batch_size,
            seq_len,
            (kv_all, film_all),
            beta_set,
            mode=mode,
            reuse_every=encoder_reuse,
            dtype=x_dtype,
        )

    if guided:
        null_text = jnp.zeros_like(text)
        # All-padding text would mask every key; leave one EOS token open.
        null_text = null_text.at[:, 0].set(1)
        null_cond_all = encode_all(null_text, jnp.zeros_like(style))
        null_kv_all = None if compact else kv_all_of(null_cond_all)
        null_mask = create_padding_mask(null_text)

    def unet(x, kvs, films, mask):
        return model.apply(
            {"params": params}, x, None, None, mask,
            method=DiffusionModel.denoise, kvs=kvs, films=films,
        )

    if compact:
        # ctx carries this step's conditioning memory (+ the B=1 sigma
        # embedding); K/V are rebuilt in-scan — tiny [L, d] matmuls.
        def denoise(x, sigma, ctx):
            cond_t, se_t, films, null_cond_t = ctx
            eps_c, pen = unet(x, kv_of(cond_t, se_t), films, text_mask)
            if not guided:
                return eps_c, pen
            eps_u, _ = unet(x, kv_of(null_cond_t, se_t), films, null_mask)
            return eps_u + guidance_scale * (eps_c - eps_u), pen

        step_ctx = (
            cond_all, sigma_embs, film_all,
            null_cond_all if guided else cond_all,
        )
    else:

        def denoise(x, sigma, ctx):
            kvs, films, null_kvs = ctx
            eps_c, pen = unet(x, kvs, films, text_mask)
            if not guided:
                return eps_c, pen
            eps_u, _ = unet(x, null_kvs, films, null_mask)
            return eps_u + guidance_scale * (eps_c - eps_u), pen

        step_ctx = (kv_all, film_all, null_kv_all if guided else kv_all)
    return diffusion_sample(
        denoise,
        key,
        batch_size,
        seq_len,
        beta_set,
        mode=mode,
        step_ctx=step_ctx,
        dtype=x_dtype,
        sample_keys=sample_keys,
        temperature=temperature,
    )


@lru_cache(maxsize=None)
def _device_beta_set(n_steps: int, schedule: str) -> jnp.ndarray:
    """Device-resident coarsened beta table, built once per (n_steps,
    schedule). The tables are tiny and deterministic, but a FRESH host
    array per call forces an H2D upload inside every sampler dispatch —
    on the axon tunnel that round trip measured 123.5 ms/call chained vs
    6.5 ms with the device-resident table reused (round 5, batch-1
    15-step DDIM) and made fewer-step sampling SLOWER end-to-end than the
    60-step path it is supposed to beat."""
    from dhg.core.schedule import halved_beta_set, strided_beta_set

    if schedule == "halved":
        table = halved_beta_set(n_steps)
    elif schedule == "strided":
        table = strided_beta_set(n_steps)
    else:
        raise ValueError(f"unknown schedule {schedule!r}")
    return jnp.asarray(table)


def generate(
    model,
    params,
    text: jnp.ndarray,  # [B, L] int32
    style: jnp.ndarray,  # [B, 14, 1280]
    key: jax.Array,
    seq_len: int | None = None,
    diffusion_mode: str = "new",
    guidance_scale: float | None = None,
    encoder_reuse: int | None = None,
    mesh=None,
    sample_keys: jax.Array | None = None,
    hoist: str | None = None,
    n_steps: int | None = None,
    schedule: str = "strided",
    temperature: float | None = None,
) -> jnp.ndarray:
    """Sample stroke sequences [B, seq_len, 3] for tokenized prompts.

    temperature: sampling temperature (superset; None/1.0 = the reference
    behavior, same compiled program). Scales x_T and all injected noise —
    < 1 gives neater, lower-variance handwriting, > 1 wilder; see
    dhg.core.sampling.diffusion_sample.

    n_steps: optional strided sub-schedule — run n_steps < 60 denoiser
    calls on a coarsened beta table that hits the same alpha_bar endpoints
    (dhg.core.schedule.strided_beta_set; strided DDPM). None/60 = the
    reference's exact 60-step loop. Speed scales ~linearly with n_steps;
    fidelity vs the 60-step trajectory is measured in PERFORMANCE.md
    ("Fewer-step sampling") — this is an opt-in superset, not a parity
    path.

    schedule: how n_steps coarsens the beta table — "strided" (default;
    index-linspace levels, right for an undistilled model) or "halved"
    (repeated 2-for-1 halving, the exact grid a progressively-distilled
    student was trained on — dhg/distill.py; n_steps must be reachable by
    halving: 30 or 15 from 60).

    diffusion_mode: "new" (reference default) | "standard" (DDPM
    ancestral) | "ddim" (deterministic DDIM, capability superset — exact
    on any strided sub-schedule, the recommended partner for small
    n_steps; dhg.core.sampling.ddim_step). Unknown strings fall through
    to "new", matching the reference's `if mode == 'standard' else new`
    dispatch (utils/nn.py:64-112).

    hoist: "full" | "compact" | None (auto = "compact"). Round-3 v5e
    measurement (PERFORMANCE.md "Round-3: hoist sweep") found compact —
    K/V rebuilt in-scan from the hoisted conditioning memory — faster at
    EVERY batch size (1: 13.1 vs 17.9 ms; 16: 30.8 vs 148.9; 96: +10%;
    256: +9% chained) and the only mode that fits batch >= 512 on 16 GB
    HBM, so auto always picks it; "full" remains opt-in for A/B runs.
    See _sample_jit's docstring for the trade-off mechanics.

    mesh: optional jax.sharding.Mesh — the batch is sharded over its 'data'
    axis (params replicated / tp-sharded per dhg.parallel.sharding), so a
    batch-256 sweep scales across all chips of a slice. Single-device when
    None.

    sample_keys: optional [B] per-request PRNG keys — each batch row draws
    its own independent noise stream, so a request's output is identical
    whether it runs alone or co-batched (continuous-batching contract).
    """
    if guidance_scale is not None and float(guidance_scale) == 1.0:
        guidance_scale = None  # g=1 is exactly the unguided sampler
    if hoist is None:
        hoist = "compact"
    # tau == 1 normalizes to the default so the jit cache key (static arg)
    # is shared with callers that never heard of temperature.
    temperature = 1.0 if temperature is None else float(temperature)
    if temperature <= 0.0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    beta_set = None
    if n_steps is not None:
        from dhg.core.schedule import N_STEPS

        # n_steps == 60 yields the canonical table bit-identically, but
        # pass None so the jit cache key (a None literal) is shared with
        # callers that never heard of n_steps.
        if n_steps != N_STEPS:
            beta_set = _device_beta_set(int(n_steps), schedule)
    if seq_len is None:
        # Longest prompt in the batch sets the bucket.
        lengths = np.asarray((text != 0).sum(axis=1))
        seq_len = infer_seq_len(int(lengths.max()))
    if mesh is not None:
        from dhg.parallel.mesh import batch_sharding
        from dhg.parallel.sharding import param_shardings

        bs = batch_sharding(mesh)
        text = jax.device_put(text, bs)
        style = jax.device_put(style, bs)
        params = jax.tree.map(jax.device_put, params, param_shardings(params, mesh))
    return _sample_jit(
        model,
        params,
        (text, style),
        text.shape[0],
        seq_len,
        key,
        beta_set,
        diffusion_mode,
        guidance_scale,
        encoder_reuse,
        sample_keys,
        hoist,
        temperature,
    )


def sample_lines(
    model,
    params,
    prompts: list[str],
    style: jnp.ndarray,  # [1 or B, 14, 1280]
    key: jax.Array,
    max_text_len: int = 50,
    diffusion_mode: str = "new",
    guidance_scale: float | None = None,
    encoder_reuse: int | None = None,
    mesh=None,
    n_steps: int | None = None,
    schedule: str = "strided",
    temperature: float | None = None,
) -> list[np.ndarray]:
    """Batched varied-length sampling (BASELINE config 2).

    All prompts run in ONE padded batch/bucket (one compiled program);
    each returned array is trimmed to its own 16*len(tokens) heuristic
    length, so per-line output matches single-prompt inference semantics.
    """
    tok = Tokenizer()
    text = jnp.asarray(tok.encode_batch(prompts, max_text_len))
    if style.shape[0] == 1 and len(prompts) > 1:
        style = jnp.broadcast_to(style, (len(prompts),) + style.shape[1:])
    lengths = [len(p) + 1 for p in prompts]  # + EOS
    bucket = infer_seq_len(max(lengths))
    out = generate(
        model,
        params,
        text,
        style,
        key,
        seq_len=bucket,
        diffusion_mode=diffusion_mode,
        guidance_scale=guidance_scale,
        encoder_reuse=encoder_reuse,
        mesh=mesh,
        n_steps=n_steps,
        schedule=schedule,
        temperature=temperature,
    )
    arr = np.asarray(out)
    return [arr[i, : infer_seq_len(l)] for i, l in enumerate(lengths)]


_style_extractors: dict = {}  # (weights_path, strict) -> apply_fn


def _style_apply_fn(style_weights, strict: bool):
    """Memoized frozen-trunk extractor: init_style_extractor re-inits the
    full MobileNetV2 (init + .npz load + fresh jit) on every call, so
    without the cache --source2 doubles that cost per infer() and a serve
    style bank pays it once per entry."""
    key = (None if style_weights is None else str(style_weights), bool(strict))
    if key not in _style_extractors:
        from dhg.models.style_extractor import init_style_extractor

        _, _, apply_fn = init_style_extractor(weights_path=style_weights, strict=strict)
        _style_extractors[key] = apply_fn
    return _style_extractors[key]


def style_from_image(
    source: str | Path,
    img_height: int = 96,
    style_weights: str | Path | None = None,
    strict: bool = False,
):
    """Read a writer-style image and extract its [1, 14, 1280] style vector.

    style_weights: converted MobileNetV2 .npz; None resolves to the repo
    default <repo>/data/mobilenetv2_tv.npz (NOT CWD-relative). A missing
    file warns loudly (random-init trunk); strict=True raises instead.
    The extractor (trunk init + weights) is built once per
    (style_weights, strict) and reused across calls.
    """
    from dhg.data.images import read_img

    img = read_img(source, img_height).astype(np.float32)
    return _style_apply_fn(style_weights, strict)(img[None])


def infer(
    prompt: str | None = None,
    source: str | None = None,
    config_path: str | None = None,
    checkpoint_path: str | None = None,
    experiment_path: str | None = None,
    output: str = "result",
    diffusion_mode: str | None = None,
    seed: int = 0,
    show: bool = False,
    guidance_scale: float | None = None,
    style_weights: str | None = None,
    strict_style: bool = False,
    n_steps: int | None = None,
    use_ema: bool = True,
    schedule: str | None = None,
    prompts_file: str | None = None,
    format: str = "png",
    temperature: float | None = None,
    source2: str | None = None,
    style_mix: float | None = None,
    wrap: int | None = None,
    line_gap: float | None = None,
    align: str = "left",
) -> np.ndarray | list[np.ndarray]:
    """End-to-end single-line inference; returns the [T, 3] stroke array.

    format: "png" (default — matplotlib render, reference-parity pixels,
    utils/vis.py:5-36) or "svg" (lossless vector export of the stroke
    polylines, a capability superset; dhg.utils.vis.strokes_to_svg).

    prompts_file: instead of one --prompt, a text file with one prompt per
    line — all lines sample in ONE padded batch (sample_lines, BASELINE
    config 2) and render to <output>_000.png, <output>_001.png, ...;
    returns the list of per-line [T_i, 3] arrays (each trimmed to its own
    16*len heuristic length, so outputs match single-prompt runs).

    style_weights: MobileNetV2 .npz path; falls back to the experiment
    config's dataset_args.style_weights, then the repo default.

    n_steps: optional fewer-step sampling; default None = the reference's
    60-step loop — UNLESS the checkpoint is a progressively-distilled
    student (config training_args.distilled_steps, dhg/distill.py), in
    which case the defaults become the student's own grid: n_steps =
    distilled_steps, schedule = "halved", diffusion_mode = "ddim" (what it
    was trained for). Explicit flags always win.

    schedule: "strided" (undistilled fewer-step default) | "halved"
    (distilled grids); None picks automatically as above.

    use_ema: prefer the checkpoint's EMA weights when present (see
    dhg.checkpoint.load_model); --use_ema=False forces raw params.

    temperature: sampling temperature (superset; None/1.0 = reference
    behavior). < 1 = neater, lower-variance handwriting; > 1 = wilder.
    Scales x_T and all injected sampler noise (dhg.core.sampling).

    wrap: paragraph mode (superset — the reference generates exactly one
    line of at most max_text_len-1 chars). --wrap=N word-wraps the prompt
    into lines of <= N chars (wrap_text; newlines force breaks, blank lines
    become paragraph gaps), samples ALL lines in one padded batch
    (sample_lines, the BASELINE config-2 machinery), and composes them into
    a single page-level stroke sequence (dhg.utils.vis.compose_lines) saved
    as one <output>.png/.svg. Returns the composed [T, 3] array.

    line_gap / align: page layout for --wrap — vertical pitch between line
    tops in stroke units (default 1.3 x the tallest line) and "left" |
    "center" per-line alignment.

    source2 / style_mix: style interpolation (superset — the reference
    conditions on exactly one style image, inference.py:69-70). With
    --source2, the conditioning style vector becomes the linear blend
    (1 - style_mix) * style(source) + style_mix * style(source2) in the
    StyleExtractor's [1, 14, 1280] feature space (style_mix defaults to
    0.5; 0 reproduces --source exactly, 1 reproduces --source2; values
    outside [0, 1] extrapolate). The sampler program is unchanged — the
    blend happens on the conditioning input, so this costs nothing.
    """
    if experiment_path:
        exp = Path(experiment_path)
        if not config_path:
            config_path = str(exp / "config.yml")
        if not checkpoint_path:
            found = resolve_checkpoint(exp)
            if found is not None:
                checkpoint_path = str(found)

    if not config_path or not checkpoint_path:
        raise ValueError(
            "Both config_path and checkpoint_path must be provided, "
            "either directly or via experiment_path."
        )

    model, params = load_model(config_path, checkpoint_path, use_ema=use_ema)

    from dhg.config import DLConfig

    cfg = DLConfig.load(config_path)
    if style_weights is None:
        style_weights = cfg.dataset_args.style_weights

    # Distilled-student defaults (explicit flags always win): sample on the
    # student's own halved grid with the deterministic DDIM rule it was
    # trained to be exact on (dhg/distill.py).
    distilled = cfg.training_args.distilled_steps
    if distilled:
        if n_steps is None:
            n_steps = int(distilled)
        if schedule is None:
            schedule = "halved"
        if diffusion_mode is None:
            diffusion_mode = "ddim"
    if diffusion_mode is None:
        diffusion_mode = "new"  # the reference default
    if schedule is None:
        schedule = "strided"

    if (prompt is None) == (prompts_file is None):
        raise ValueError("provide exactly one of prompt or prompts_file")
    if source is None:
        raise ValueError("source (writer-style image) is required")

    if style_mix is not None and source2 is None:
        raise ValueError("style_mix requires source2 (a second style image)")

    style = jnp.asarray(
        style_from_image(source, style_weights=style_weights, strict=strict_style)
    )
    if source2 is not None:
        mix = 0.5 if style_mix is None else float(style_mix)
        style2 = jnp.asarray(
            style_from_image(source2, style_weights=style_weights, strict=strict_style)
        )
        style = (1.0 - mix) * style + mix * style2

    if wrap is not None:
        if prompts_file is not None:
            raise ValueError("wrap applies to a single --prompt, not prompts_file")
        # Coerce ONCE before validating (serve.py does int(req["wrap"]) up
        # front) so a fractional flag value can't pass validation as-is and
        # then silently truncate at wrap_text.
        wrap = int(wrap)
        max_text_len = int(cfg.dataset_args.max_text_len or 50)
        if wrap + 1 > max_text_len:
            raise ValueError(
                f"wrap={wrap} + EOS exceeds the model's max_text_len="
                f"{max_text_len}; use wrap <= {max_text_len - 1}"
            )
        wrapped = wrap_text(prompt, wrap)
        to_sample = [ln for ln in wrapped if ln]
        if not to_sample:
            raise ValueError("prompt has no printable content to wrap")
        sampled = sample_lines(
            model,
            params,
            to_sample,
            style,
            jax.random.PRNGKey(seed),
            max_text_len=max_text_len,
            diffusion_mode=diffusion_mode,
            guidance_scale=guidance_scale,
            n_steps=n_steps,
            schedule=schedule,
            temperature=temperature,
        )
        it = iter(sampled)
        page = compose_lines(
            [next(it) if ln else None for ln in wrapped],
            line_gap=line_gap,
            align=align,
        )
        save_strokes(page, output, fmt=format, show_output=show)
        return page

    if prompts_file is not None:
        prompts = [ln for ln in Path(prompts_file).read_text().splitlines() if ln.strip()]
        if not prompts:
            raise ValueError(f"no prompts in {prompts_file}")
        lines = sample_lines(
            model,
            params,
            prompts,
            style,
            jax.random.PRNGKey(seed),
            max_text_len=cfg.dataset_args.max_text_len or 50,
            diffusion_mode=diffusion_mode,
            guidance_scale=guidance_scale,
            n_steps=n_steps,
            schedule=schedule,
            temperature=temperature,
        )
        for i, arr in enumerate(lines):
            save_strokes(arr, f"{output}_{i:03d}", fmt=format, show_output=show)
        return lines

    tokenizer = Tokenizer()
    encoded = tokenizer.encode(prompt)
    text = jnp.asarray([encoded], jnp.int32)
    seq_len = infer_seq_len(len(encoded))

    strokes = generate(
        model,
        params,
        text,
        style,
        jax.random.PRNGKey(seed),
        seq_len=seq_len,
        diffusion_mode=diffusion_mode,
        guidance_scale=guidance_scale,
        n_steps=n_steps,
        schedule=schedule,
        temperature=temperature,
    )
    result = np.asarray(strokes[0])
    save_strokes(result, output, fmt=format, show_output=show)
    return result


def main(argv=None):
    kwargs = parse_cli_kwargs(argv if argv is not None else sys.argv[1:], help_text=__doc__)
    infer(**kwargs)


if __name__ == "__main__":
    main()
