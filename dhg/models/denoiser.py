"""The denoiser: a 1-D conv U-Net with text/style cross-attention.

Architecture parity with the reference DiffusionModel (model.py:61-182),
re-laid-out channel-last [B, T, C] end-to-end (no transposes — the
reference's [B,C,T] <-> [B,T,C] shuffles are a torch Conv1d artifact):

  input Dense(2 -> c1)
  enc1 ConvBlock(c1)                                   [B, T,   c1]
  pool/2 -> enc2 ConvBlock(c2) -> enc3 EncoderLayer(heads=3, pos_factor=4)
                                                        [B, T/2, c2]
  pool/2 -> enc4 ConvBlock(c3) -> enc5 EncoderLayer(heads=4, pos_factor=2)
                                                        [B, T/4, c3]
  pool/2 -> Dense(c3 -> 2*c2) -> N x EncoderLayer(heads=6)
                                                        [B, T/8, 2*c2]
  upsample x2 + k3-conv skip(h3) -> dec3 ConvBlock(c3)
  upsample x2 + k3-conv skip(h2) -> dec2 ConvBlock(c2)
  upsample x2 + k3-conv skip(h1) -> dec1 ConvBlock(c1)
  heads: Dense(c1 -> 2) noise prediction; Dense(c1 -> 1) + sigmoid pen lifts

sigma enters as sqrt(alpha_bar) [B, 1] (train.py:49, inference.py:89), is
embedded once by a SiLU-MLP with hidden 2048 into 32 dims (model.py:83), and
conditions all 23 affine layers.

Default channel plan (train.py:140-146): c1 = channels, c2 = channels*3//2,
c3 = channels*2 — i.e. 128/192/256, bottleneck width 384.

TPU-first structure: the forward is split into `embed_sigma` + `encode_cond`
(text/style conditioning memory) and `denoise` (the U-Net). Training uses
the fused __call__; the sampler precomputes (sigma_emb, cond) for ALL 60
diffusion steps in one batched pass and scans only over `denoise` — the
TextStyleEncoder never runs inside the sampling loop (numerically identical,
conditioning depends on sigma but not on x_t).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from dhg.models.encoder_layer import EncoderLayer
from dhg.models.text_style import TextStyleEncoder
from dhg.ops.basic import FFN, create_padding_mask, dense
from dhg.ops.conv import ConvBlock, avg_pool_1d, conv1d_same, upsample_nearest_1d


def _wb(mod, bf):
    p = mod.variables["params"]
    return p["kernel"].astype(bf), p["bias"].astype(bf)


def _ffn_wb(ffn, name, bf):
    p = ffn.variables["params"][name]
    return p["kernel"].astype(bf), p["bias"].astype(bf)


def _encoder_layer_ops(layer, kv, film3, bf):
    """Flat operand list for one EncoderLayer in the Pallas kernels
    (dhg/kernels/fused_bottleneck.py _PER_LAYER order)."""
    kh, vh = kv
    (g1, be1), (g2, be2), (g3, be3) = film3
    return [
        kh.astype(bf), vh.astype(bf),
        *_wb(layer.mha.wq, bf), *_wb(layer.mha.dense, bf),
        *_wb(layer.mha2.wq, bf), *_wb(layer.mha2.wk, bf),
        *_wb(layer.mha2.wv, bf), *_wb(layer.mha2.dense, bf),
        *_ffn_wb(layer.ffn, "fc1", bf), *_ffn_wb(layer.ffn, "fc2", bf),
        g1.astype(bf), be1.astype(bf),
        g2.astype(bf), be2.astype(bf),
        g3.astype(bf), be3.astype(bf),
    ]


class DiffusionModel(nn.Module):
    num_layers: int = 2
    c1: int = 128
    c2: int = 192
    c3: int = 256
    drop_rate: float = 0.0
    dtype: Any = None

    def setup(self):
        c1, c2, c3, dt = self.c1, self.c2, self.c3, self.dtype
        dr = self.drop_rate

        self.sigma_ffn = FFN(c1 // 4, hidden=2048, dtype=dt)
        self.text_style_model = TextStyleEncoder(c2 * 2, c2 * 4, dtype=dt)

        self.input_dense = dense(c1, 2, dt)
        self.enc1 = ConvBlock(c1, dilation=1, drop_rate=dr, dtype=dt)
        self.enc2 = ConvBlock(c2, dilation=1, drop_rate=dr, dtype=dt)
        self.enc3 = EncoderLayer(c2, 3, dr, pos_factor=4.0, dtype=dt, d_inp=c2 * 2)
        self.enc4 = ConvBlock(c3, dilation=1, drop_rate=dr, dtype=dt)
        self.enc5 = EncoderLayer(c3, 4, dr, pos_factor=2.0, dtype=dt, d_inp=c2 * 2)

        self.att_dense = dense(c2 * 2, c3, dt)
        # List entries auto-name as att_layers_<i> under setup.
        self.att_layers = [
            EncoderLayer(c2 * 2, 6, dr, dtype=dt, d_inp=c2 * 2)
            for i in range(self.num_layers)
        ]

        self.skip_conv1 = conv1d_same(c2, c1, dtype=dt)
        self.skip_conv2 = conv1d_same(c3, c2, dtype=dt)
        self.skip_conv3 = conv1d_same(c2 * 2, c3, dtype=dt)
        self.dec3 = ConvBlock(c3, dilation=1, drop_rate=dr, dtype=dt)
        self.dec2 = ConvBlock(c2, dilation=1, drop_rate=dr, dtype=dt)
        self.dec1 = ConvBlock(c1, dilation=1, drop_rate=dr, dtype=dt)

        self.output_dense = dense(2, c1, dt)
        self.pen_lifts_dense = dense(1, c1, dt)

    # -- conditioning (x_t-independent; hoistable out of the sampler loop) --

    def embed_sigma(self, sigma: jnp.ndarray) -> jnp.ndarray:
        """[B, 1] sqrt(alpha_bar) -> [B, 32] embedding."""
        return self.sigma_ffn(sigma)

    def encode_cond(
        self,
        text: jnp.ndarray,
        style: jnp.ndarray,
        sigma_emb: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """[B, L] tokens + [B, 14, 1280] style -> [B, L, 2*c2] memory."""
        return self.text_style_model(text, style, sigma_emb, deterministic)

    def encode_cond_pre(
        self, text: jnp.ndarray, style: jnp.ndarray, deterministic: bool = True
    ):
        """sigma-independent half of the conditioning encoder — the sampler
        runs this once per call instead of once per diffusion step."""
        return self.text_style_model.pre(text, style, deterministic)

    def encode_cond_tail(self, pre, sigma_emb: jnp.ndarray) -> jnp.ndarray:
        """sigma-dependent half; encode_cond == encode_cond_tail(encode_cond_pre)."""
        text_pre, style_pre = pre
        return self.text_style_model.tail(text_pre, style_pre, sigma_emb)

    # -- the U-Net ----------------------------------------------------------

    def precompute_cross_kv(self, cond: jnp.ndarray, sigma_emb: jnp.ndarray):
        """All cross-attention (K, V) pairs — the full text side of every
        EncoderLayer (text projection, LN, affine, PE, Wk/Wv head split).

        Depends only on (cond, sigma_emb), never on x_t: the sampler runs
        this for all 60 diffusion steps in one vmapped pass outside the
        scan and feeds the result to denoise(kvs=...), which is numerically
        identical to denoise() but keeps the hot loop stroke-side only.
        Order: (enc3, enc5, att_layers...).
        """
        layers = (self.enc3, self.enc5, *self.att_layers)
        return tuple(layer.text_kv(cond, sigma_emb) for layer in layers)

    def precompute_film(self, sigma_emb: jnp.ndarray):
        """FiLM (gamma, beta) pairs for every affine on the x_t path — 23
        tiny sigma-only Denses that the sampler hoists out of its scan
        (alongside precompute_cross_kv) so the hot loop runs zero
        sigma-side ops. Keys: "conv" = (enc1, enc2, enc4, dec3, dec2, dec1)
        ConvBlock coefficient triples; "attn" = (enc3, enc5, att_layers...)
        EncoderLayer coefficient triples.
        """
        conv_blocks = (self.enc1, self.enc2, self.enc4, self.dec3, self.dec2, self.dec1)
        attn_layers = (self.enc3, self.enc5, *self.att_layers)
        return {
            "conv": tuple(b.film_coeffs(sigma_emb) for b in conv_blocks),
            "attn": tuple(l.film_coeffs(sigma_emb) for l in attn_layers),
        }

    def encode_unet(
        self,
        strokes: jnp.ndarray,
        cond: jnp.ndarray,
        sigma_emb: jnp.ndarray,
        text_mask: jnp.ndarray,
        deterministic: bool = True,
        kvs=None,
        films=None,
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Encoder half: x_t -> (h1 [B,T,c1], h2 [B,T/2,c2], h3 [B,T/4,c3]).

        Split out so the sampler's optional encoder-reuse mode (Li et al.,
        "Faster Diffusion", arXiv:2312.09608 — encoder features vary slowly
        across adjacent timesteps) can cache these between steps. `kvs` /
        `films` optionally carry precomputed cross-attention K/V pairs and
        FiLM coefficients (precompute_cross_kv / precompute_film); cond is
        then unused.
        """
        cf = films["conv"] if films is not None else (None,) * 6
        af = films["attn"] if films is not None else (None,) * (2 + self.num_layers)
        # Single-layer attention kernels for enc3/enc5 win at small batch
        # (+3% at 96) but lose at large (-5% at 256): fewer grid cells no
        # longer offset XLA's better inter-op overlap once the device is
        # saturated. Crossover measured between 96 and 256 (PERFORMANCE.md).
        # Below batch 8 the row packing degenerates and the two extra
        # remote Pallas compiles dominate any gain, so they stay unfused
        # on the latency path too.
        fuse_enc = (
            self._can_fuse_bottleneck(kvs, films, deterministic)
            and 8 <= strokes.shape[0] <= 128
        )
        x = self.input_dense(strokes)
        h1 = self.enc1(x, sigma_emb, deterministic, coeffs=cf[0])
        h2 = avg_pool_1d(h1)
        h2 = self.enc2(h2, sigma_emb, deterministic, coeffs=cf[1])
        kv3 = kvs[0] if kvs is not None else self.enc3.text_kv(cond, sigma_emb)
        if fuse_enc:
            h2 = self._fused_layer(self.enc3, h2, kv3, af[0], text_mask)
        else:
            h2 = self.enc3.attend(h2, kv3, sigma_emb, text_mask, deterministic, af[0])
        h3 = avg_pool_1d(h2)
        h3 = self.enc4(h3, sigma_emb, deterministic, coeffs=cf[2])
        kv5 = kvs[1] if kvs is not None else self.enc5.text_kv(cond, sigma_emb)
        if fuse_enc:
            h3 = self._fused_layer(self.enc5, h3, kv5, af[1], text_mask)
        else:
            h3 = self.enc5.attend(h3, kv5, sigma_emb, text_mask, deterministic, af[1])
        return h1, h2, h3

    def _fused_layer(self, layer, x, kv, film3, text_mask):
        """Route one EncoderLayer.attend through the single-layer Pallas
        kernel (sampler path; gated by _can_fuse_bottleneck)."""
        from dhg.kernels.fused_bottleneck import fused_encoder_layer
        from dhg.kernels.runtime import sdpa_batched
        from dhg.ops.attention import pos_embeddings

        bf = jnp.bfloat16
        pe = pos_embeddings(x.shape[1], layer.d_out, layer.pos_factor, bf)[0]
        neg = (text_mask * -1e9).astype(bf)[:, 0]
        b = x.shape[0]
        rows = next(r for r in (8, 4, 2, 1) if b % r == 0)
        import jax as _jax

        return fused_encoder_layer(
            x.astype(bf), pe, neg,
            tuple(_encoder_layer_ops(layer, kv, film3, bf)),
            num_heads=layer.num_heads, rows=rows,
            interpret=_jax.default_backend() != "tpu",
            batched=sdpa_batched(),
        )

    def decode_unet(
        self,
        feats: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
        cond: jnp.ndarray,
        sigma_emb: jnp.ndarray,
        text_mask: jnp.ndarray,
        deterministic: bool = True,
        kvs=None,
        films=None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Bottleneck + decoder half: (h1, h2, h3) -> (eps_pred, pen)."""
        cf = films["conv"] if films is not None else (None,) * 6
        af = films["attn"] if films is not None else (None,) * (2 + self.num_layers)
        h1, h2, h3 = feats
        x = avg_pool_1d(h3)
        if self._can_fuse_bottleneck(kvs, films, deterministic):
            x = self._fused_bottleneck(x, kvs, films, text_mask)
        else:
            x = self.att_dense(x)
            for i, layer in enumerate(self.att_layers):
                kv = kvs[2 + i] if kvs is not None else layer.text_kv(cond, sigma_emb)
                x = layer.attend(x, kv, sigma_emb, text_mask, deterministic, af[2 + i])

        x = upsample_nearest_1d(x) + self.skip_conv3(h3)
        x = self.dec3(x, sigma_emb, deterministic, coeffs=cf[3])
        x = upsample_nearest_1d(x) + self.skip_conv2(h2)
        x = self.dec2(x, sigma_emb, deterministic, coeffs=cf[4])
        x = upsample_nearest_1d(x) + self.skip_conv1(h1)
        x = self.dec1(x, sigma_emb, deterministic, coeffs=cf[5])

        eps_pred = self.output_dense(x)
        pen = nn.sigmoid(self.pen_lifts_dense(x))[..., 0]
        # Heads return float32 for numerically stable losses/sampling.
        return eps_pred.astype(jnp.float32), pen.astype(jnp.float32)

    def _can_fuse_bottleneck(self, kvs, films, deterministic) -> bool:
        """The Pallas bottleneck megakernel applies on the sampler path
        only: bf16 compute, precomputed kvs+films (with the B=1 FiLM
        broadcast), no active dropout. Default-on on TPU for the canonical
        d=384 bottleneck ("auto"); DHG_FUSED_BOTTLENECK=1 forces any
        shape, =0 disables. Forward-only — the sampler never
        differentiates."""
        from dhg.kernels.runtime import fused_bottleneck_mode

        mode = fused_bottleneck_mode()
        if mode == "off":
            return False
        if mode == "auto" and self.c2 * 2 != 384:
            return False
        return (
            not self.is_initializing()
            and self.num_layers > 0
            and kvs is not None
            and films is not None
            and self.dtype == jnp.bfloat16
            and (self.drop_rate == 0.0 or deterministic)
            and films["attn"][0][0][0].shape[0] == 1  # B=1 gamma broadcast
        )

    def _fused_bottleneck(self, x, kvs, films, text_mask):
        """Collect weights and dispatch the Pallas megakernel (att_dense +
        the whole att_layers stack in ONE program per batch row)."""
        from dhg.kernels.fused_bottleneck import fused_bottleneck
        from dhg.kernels.runtime import sdpa_batched
        from dhg.ops.attention import pos_embeddings

        bf = jnp.bfloat16
        d = self.c2 * 2

        aw, ab = _wb(self.att_dense, bf)
        pe = pos_embeddings(x.shape[1], d, 1.0, bf)[0]
        neg = (text_mask * -1e9).astype(bf)[:, 0]  # [B, 1, L]

        ops = []
        for i, layer in enumerate(self.att_layers):
            ops += _encoder_layer_ops(layer, kvs[2 + i], films["attn"][2 + i], bf)

        heads = self.att_layers[0].num_heads
        import jax as _jax

        b = x.shape[0]
        rows = next(r for r in (8, 4, 2, 1) if b % r == 0)
        return fused_bottleneck(
            x.astype(bf), aw, ab, pe, neg, tuple(ops),
            num_layers=self.num_layers, num_heads=heads, rows=rows,
            interpret=_jax.default_backend() != "tpu",
            batched=sdpa_batched(),
        )

    def _can_fuse_t4(self, kvs, films, deterministic) -> bool:
        """Gate for the extended T/4 megakernel (enc4 + enc5 + bottleneck
        + skip_conv3 + dec3 in one Pallas program). Same preconditions as
        the bottleneck kernel; "auto" restricts to the canonical channel
        plan (c1=128)."""
        from dhg.kernels.runtime import fused_t4_mode

        mode = fused_t4_mode()
        if mode == "off":
            return False
        if mode == "auto" and (self.c1, self.c2, self.c3) != (128, 192, 256):
            return False
        return (
            not self.is_initializing()
            and self.num_layers > 0
            and kvs is not None
            and films is not None
            and self.dtype == jnp.bfloat16
            and (self.drop_rate == 0.0 or deterministic)
            and films["attn"][0][0][0].shape[0] == 1
        )

    def _denoise_fused_t4(
        self, strokes, text_mask, kvs, films
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """denoise() with the whole T/4..T/8 region in one Pallas program
        (dhg/kernels/fused_bottleneck.py::fused_unet_t4). Outer stages
        (enc1-enc3, dec2-dec1, heads) mirror encode_unet/decode_unet."""
        from dhg.kernels.fused_bottleneck import fused_unet_t4
        from dhg.ops.attention import pos_embeddings

        bf = jnp.bfloat16
        cf = films["conv"]
        af = films["attn"]

        def conv_ops(block, film3):
            (g1, be1), (g2, be2), (g3, be3) = film3
            return [
                *_wb(block.conv_skip, bf), *_wb(block.conv1, bf),
                *_wb(block.conv2, bf), *_wb(block.fc, bf),
                g1.astype(bf), be1.astype(bf),
                g2.astype(bf), be2.astype(bf),
                g3.astype(bf), be3.astype(bf),
            ]

        def layer_ops(layer, kv, film3):
            return _encoder_layer_ops(layer, kv, film3, bf)

        # Encoder down to T/2 (identical to encode_unet).
        x = self.input_dense(strokes)
        h1 = self.enc1(x, None, True, coeffs=cf[0])
        h2 = avg_pool_1d(h1)
        h2 = self.enc2(h2, None, True, coeffs=cf[1])
        h2 = self.enc3.attend(h2, kvs[0], None, text_mask, True, af[0])

        # Fused region: pooled h2 -> dec3 output, one Pallas program.
        x4 = avg_pool_1d(h2)
        t4 = x4.shape[1]
        d = self.c2 * 2
        neg = (text_mask * -1e9).astype(bf)[:, 0]  # [B, 1, L]
        pe4 = pos_embeddings(t4, self.c3, 2.0, bf)[0]
        pe8 = pos_embeddings(t4 // 2, d, 1.0, bf)[0]
        aw, ab = _wb(self.att_dense, bf)
        sk3w, sk3b = _wb(self.skip_conv3, bf)

        att_ops = []
        for i, layer in enumerate(self.att_layers):
            att_ops += layer_ops(layer, kvs[2 + i], af[2 + i])

        b = x4.shape[0]
        rows = next(r for r in (8, 4, 2, 1) if b % r == 0)
        import jax as _jax

        from dhg.kernels.runtime import sdpa_batched

        x = fused_unet_t4(
            x4.astype(bf), neg, pe4, pe8, aw, ab, sk3w, sk3b,
            tuple(conv_ops(self.enc4, cf[2])),
            tuple(layer_ops(self.enc5, kvs[1], af[1])),
            tuple(conv_ops(self.dec3, cf[3])),
            tuple(att_ops),
            num_layers=self.num_layers,
            att_heads=self.att_layers[0].num_heads,
            enc5_heads=self.enc5.num_heads,
            rows=rows,
            interpret=_jax.default_backend() != "tpu",
            batched=sdpa_batched(),
        )

        # Decoder back up (identical to decode_unet's tail).
        x = upsample_nearest_1d(x) + self.skip_conv2(h2)
        x = self.dec2(x, None, True, coeffs=cf[4])
        x = upsample_nearest_1d(x) + self.skip_conv1(h1)
        x = self.dec1(x, None, True, coeffs=cf[5])
        eps_pred = self.output_dense(x)
        pen = nn.sigmoid(self.pen_lifts_dense(x))[..., 0]
        return eps_pred.astype(jnp.float32), pen.astype(jnp.float32)

    def denoise(
        self,
        strokes: jnp.ndarray,
        cond: jnp.ndarray,
        sigma_emb: jnp.ndarray,
        text_mask: jnp.ndarray,
        deterministic: bool = True,
        kvs=None,
        films=None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        if self._can_fuse_t4(kvs, films, deterministic):
            return self._denoise_fused_t4(strokes, text_mask, kvs, films)
        feats = self.encode_unet(
            strokes, cond, sigma_emb, text_mask, deterministic, kvs, films
        )
        return self.decode_unet(
            feats, cond, sigma_emb, text_mask, deterministic, kvs, films
        )

    def __call__(
        self,
        strokes: jnp.ndarray,  # [B, T, 2], T % 8 == 0
        text: jnp.ndarray,  # [B, L] int tokens
        sigma: jnp.ndarray,  # [B, 1] = sqrt(alpha_bar)
        style: jnp.ndarray,  # [B, 14, 1280]
        deterministic: bool = True,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        sigma_emb = self.embed_sigma(sigma)
        text_mask = create_padding_mask(text)
        cond = self.encode_cond(text, style, sigma_emb, deterministic)
        return self.denoise(strokes, cond, sigma_emb, text_mask, deterministic)

    @staticmethod
    def from_config(training_args, dtype: Any = None) -> "DiffusionModel":
        """Build with the reference channel plan (train.py:139-146)."""
        ch = training_args.get("channels", 128)
        return DiffusionModel(
            num_layers=training_args.get("att_layers_num", 2),
            c1=ch,
            c2=ch * 3 // 2,
            c3=ch * 2,
            drop_rate=training_args.get("dropout", 0.0) or 0.0,
            dtype=dtype,
        )
