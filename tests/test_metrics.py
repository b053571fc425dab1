"""Generation-quality metrics: rasterizer semantics, KS stats, Fréchet."""

import numpy as np
import pytest

from dhg.metrics import (
    compare_stroke_sets,
    drawn_segments,
    frechet_distance,
    frechet_style_distance,
    ks_distance,
    rasterize_strokes,
    stroke_stats,
)


def _line(dxs, pens):
    """[T, 3] sequence from per-step dx (dy=0) and pen flags."""
    dxs = np.asarray(dxs, float)
    return np.stack([dxs, np.zeros_like(dxs), np.asarray(pens, float)], axis=1)


class TestDrawnSegments:
    def test_pen_semantics_match_show_strokes(self):
        # Points 0..4; pen-up at 2 (segment 1->2 skipped) and 4 (last:
        # nothing at/after point 4 drawn).
        seq = _line([1, 1, 1, 1, 1], [0, 0, 1, 0, 1])
        _, draw = drawn_segments(seq)
        np.testing.assert_array_equal(draw, [True, False, True, False])

    def test_no_pen_up_draws_nothing(self):
        # Reference loop quirk: zero pen-ups -> no polyline at all.
        _, draw = drawn_segments(_line([1, 1, 1], [0, 0, 0]))
        assert not draw.any()

    def test_padding_rows_add_no_ink(self):
        # (0,0,1) padding rows after the real line: segments into pen-up
        # points are skipped and the pads have zero extent anyway.
        seq = np.concatenate([_line([1, 1, 1], [0, 0, 1]), _line([0, 0], [1, 1])])
        xy, draw = drawn_segments(seq)
        # Only segment 0->1 is drawn: point 2 is pen-up (the segment
        # arriving at it was a pen-up move) and the pads are all pen-up.
        assert draw[0] and not draw[1:].any()
        real_only, real_draw = drawn_segments(_line([1, 1, 1], [0, 0, 1]))
        np.testing.assert_array_equal(draw[: len(real_draw)], real_draw)


class TestRasterizer:
    def test_ink_where_expected(self):
        seq = _line([0, 5, 5, 5, 0], [0, 0, 0, 0, 1])
        img = rasterize_strokes(seq, height=32)
        assert img.shape[0] == 32
        assert (img == 0).any() and (img == 255).any()
        # A horizontal line: ink concentrated in a narrow row band.
        ink_rows = np.flatnonzero((img == 0).any(axis=1))
        assert np.ptp(ink_rows) <= 5

    def test_pen_break_leaves_gap(self):
        # Two dashes separated by a long pen-up jump: the jump column range
        # must stay white.
        seq = _line([0, 5, 5, 30, 5, 5, 0], [0, 0, 0, 1, 0, 0, 1])
        img = rasterize_strokes(seq, height=32, thickness=1.0)
        cols_with_ink = (img == 0).any(axis=0)
        runs = np.flatnonzero(cols_with_ink)
        gap = np.diff(runs).max()
        assert gap > 10  # the pen-up jump is not drawn

    def test_blank_input_gives_white_page(self):
        img = rasterize_strokes(_line([1, 1], [0, 0]), height=16, width=24)
        assert img.shape == (16, 24)
        assert (img == 255).all()

    def test_fixed_width_pads_and_fits(self):
        seq = _line([0, 5, 5, 0], [0, 0, 0, 1])
        img = rasterize_strokes(seq, height=32, width=200)
        assert img.shape == (32, 200)
        wide = rasterize_strokes(
            _line([0] + [30] * 40 + [0], [0] * 41 + [1]), height=32, width=64
        )
        assert wide.shape == (32, 64)  # shrunk to fit, no overflow


class TestStats:
    def test_stats_on_crafted_line(self):
        seq = _line([2, 2, 2, 2], [0, 0, 0, 1])
        s = stroke_stats([seq])
        assert s["dx_mean"][0] == pytest.approx(2.0)
        assert s["pen_lift_rate"][0] == pytest.approx(0.25)
        assert s["path_len"][0] == pytest.approx(8.0)
        assert s["active_len"][0] == 4.0
        assert s["net_advance"][0] == pytest.approx(8.0)

    def test_active_prefix_excludes_padding(self):
        real = _line([1, 1, 1], [0, 0, 1])
        padded = np.concatenate([real, _line([0] * 5, [1] * 5)])
        a = stroke_stats([real])
        # Padding rows ARE pen-up rows, so the active prefix extends to the
        # last pad — but zero-motion pads change path_len/net_advance by 0.
        b = stroke_stats([padded])
        assert b["path_len"][0] == a["path_len"][0]
        assert b["net_advance"][0] == a["net_advance"][0]

    def test_ks_identical_and_disjoint(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=500)
        assert ks_distance(x, x) == 0.0
        assert ks_distance(x, x + 100.0) == 1.0
        assert ks_distance(x, rng.normal(size=500)) < 0.15

    def test_compare_stroke_sets_self_small(self):
        rng = np.random.default_rng(1)
        seqs = [
            np.stack(
                [rng.normal(size=30), rng.normal(size=30), rng.random(30) < 0.2],
                axis=1,
            ).astype(float)
            for _ in range(12)
        ]
        ks = compare_stroke_sets(seqs, seqs)
        assert ks["ks_mean"] == 0.0
        shifted = [s + np.array([5.0, 0, 0]) for s in seqs]
        assert compare_stroke_sets(shifted, seqs)["ks_mean"] > 0.3


class TestFrechet:
    def test_identical_moments_zero(self):
        mu = np.array([1.0, -2.0])
        cov = np.array([[2.0, 0.3], [0.3, 1.0]])
        assert frechet_distance(mu, cov, mu, cov) == pytest.approx(0.0, abs=1e-8)

    def test_analytic_diagonal(self):
        # Diagonal Gaussians: d^2 = |mu1-mu2|^2 + sum (sqrt(v1)-sqrt(v2))^2.
        mu1, mu2 = np.zeros(3), np.array([1.0, 0, 0])
        c1, c2 = np.diag([1.0, 4.0, 9.0]), np.diag([4.0, 4.0, 1.0])
        expect = 1.0 + (1 - 2) ** 2 + 0.0 + (3 - 1) ** 2
        assert frechet_distance(mu1, c1, mu2, c2) == pytest.approx(expect, rel=1e-6)

    def test_fsd_self_near_zero_and_orders(self):
        rng = np.random.default_rng(2)

        def make_set(shift):
            out = []
            for _ in range(10):
                d = rng.normal(loc=[0.5 + shift, 0.0], scale=0.4, size=(40, 2))
                pen = (rng.random(40) < 0.15).astype(float)
                pen[-1] = 1.0
                out.append(np.concatenate([d, pen[:, None]], axis=1))
            return out

        a, b, far = make_set(0.0), make_set(0.0), make_set(4.0)
        # Tiny mean-pixel embedding: keeps the test CPU-fast and deterministic.
        feat = lambda imgs: imgs.reshape(len(imgs), 12, -1).mean(axis=2)
        d_ab = frechet_style_distance(a, b, feature_fn=feat, height=24, width=64)
        d_af = frechet_style_distance(a, far, feature_fn=feat, height=24, width=64)
        d_aa = frechet_style_distance(a, a, feature_fn=feat, height=24, width=64)
        assert d_aa == pytest.approx(0.0, abs=1e-6)
        assert d_af > d_ab >= 0.0


class TestStyleFeatureDefault:
    def test_default_embedding_shape(self):
        # Exercises the real StyleExtractor path once (random trunk, small).
        from dhg.metrics import style_features

        pages = np.full((2, 96, 128), 255.0, np.float32)
        pages[:, 40:50, 20:100] = 0.0
        feats = style_features(pages)
        assert feats.shape == (2, 1280)
        assert np.isfinite(feats).all()


class TestEvaluateGeneration:
    def test_cli_end_to_end_on_tiny_run(self, tmp_path):
        """evaluate_generation on a real (tiny, synthetic) experiment dir."""
        import jax

        from dhg.checkpoint import save_checkpoint
        from dhg.config import DLConfig, fit_config
        from dhg.metrics import evaluate_generation
        from dhg.train import Trainer

        cfg = DLConfig(
            fit_config(
                config="smoke.yml",
                **{
                    "training_args.steps": 4,
                    "training_args.channels": 32,
                    "training_args.att_layers_num": 1,
                    "training_args.batch_size": 4,
                    "training_args.max_files": 8,
                    "training_args.compute_dtype": "float32",
                    "dataset_args.max_seq_len": 96,
                    "dataset_args.max_text_len": 20,
                },
            )
        )
        t = Trainer(cfg)
        data = t.load_dataset()
        state = t.init_state(0)
        step = t.make_step_fn(data)
        for i in range(4):
            state, _ = step(state, jax.random.fold_in(jax.random.PRNGKey(0), i))
        save_checkpoint(tmp_path / "model_final", state.params)
        cfg.dump(tmp_path / "config.yml")

        out = evaluate_generation(
            str(tmp_path),
            split="validation",
            n_samples=6,
            batch_size=4,
            n_steps=10,  # strided sub-schedule: 10 denoiser calls, CPU-fast
            fsd=False,  # 1280x1280 eig is the CLI's job, not the unit suite's
        )
        assert out["n"] == 6
        assert 0.0 <= out["ks"]["ks_mean"] <= 1.0
        assert set(out["ks"]) > {"dx_mean", "pen_lift_rate", "path_len"}
