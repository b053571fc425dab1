"""Native C++ stroke kernels vs the numpy reference implementation."""

import numpy as np
import pytest

from dhg.data.strokes import combine_strokes
from dhg.native import combine_strokes_native, get_lib, simplify_strokes_native

pytestmark = pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")


def _random_strokes(n, seed):
    rng = np.random.RandomState(seed)
    xyz = rng.randn(n, 3)
    xyz[:, 2] = (rng.rand(n) < 0.1).astype(float)
    xyz[:, :2] /= np.std(xyz[:, :2])
    return xyz


@pytest.mark.parametrize("n,seed", [(100, 0), (101, 1), (37, 2), (512, 3)])
def test_combine_pass_matches_numpy(n, seed):
    xyz = _random_strokes(n, seed)
    n_merge = int(n * 0.2)
    ref = combine_strokes(xyz.copy(), n_merge)
    out = combine_strokes_native(xyz.copy(), n_merge)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("n,seed", [(240, 4), (333, 5)])
def test_full_pipeline_matches_numpy(n, seed):
    xyz = _random_strokes(n, seed)
    ref = xyz.copy()
    for _ in range(3):
        ref = combine_strokes(ref, int(len(ref) * 0.2))
    out = simplify_strokes_native(xyz.copy(), passes=3, frac=0.2)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-10, atol=1e-12)


def test_pen_bits_preserved():
    xyz = np.zeros((10, 3))
    xyz[:, 0] = 1.0  # all collinear
    xyz[3, 2] = 1.0
    out = simplify_strokes_native(xyz, passes=1, frac=0.3)
    ref = combine_strokes(xyz.copy(), 3)
    np.testing.assert_allclose(out, ref, rtol=1e-12)
    assert set(np.unique(out[:, 2])) <= {0.0, 1.0}
