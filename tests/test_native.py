"""Native C++ host kernels vs the pure-Python reference implementations.

The native layer is optional (ctypes + in-tree make build); these tests are
skipped when no C++ toolchain is available.
"""

import numpy as np
import pytest

from morl_baselines_tpu.core.indicators import _hv_wfg, hypervolume, hypervolume_2d
from morl_baselines_tpu.core.pareto import non_dominated_mask
from morl_baselines_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def _random_front(rng, n, d):
    # points on the positive unit sphere → mutually non-dominated, plus noise
    pts = np.abs(rng.normal(size=(n, d)))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    extra = pts[rng.integers(0, n, size=n // 2)] * rng.uniform(0.2, 0.95, size=(n // 2, 1))
    return np.concatenate([pts, extra])


@pytest.mark.parametrize("d", [2, 3, 4, 5])
def test_hv_matches_python_wfg(d):
    rng = np.random.default_rng(d)
    pts = _random_front(rng, 40, d)
    ref = np.full((d,), -0.1)
    got = native.hv_exact(pts, ref)
    want = _hv_wfg(pts, ref)
    assert got == pytest.approx(want, rel=1e-9)


def test_hv_matches_device_2d():
    rng = np.random.default_rng(7)
    pts = _random_front(rng, 60, 2)
    ref = np.zeros(2)
    got = native.hv_exact(pts, ref)
    dev = float(hypervolume_2d(pts.astype(np.float32), ref.astype(np.float32)))
    assert got == pytest.approx(dev, rel=1e-4)


def test_hv_known_value():
    # two unit squares overlapping in [0.5,1]^2: 1 + 1 - 0.25... no:
    # boxes [0,(1,2)] and [0,(2,1)]: union = 2 + 2 - 1 = 3
    pts = np.array([[1.0, 2.0], [2.0, 1.0]])
    assert native.hv_exact(pts, np.zeros(2)) == pytest.approx(3.0)
    # dominated + below-ref points contribute nothing
    pts2 = np.vstack([pts, [[0.5, 0.5], [-1.0, 5.0]]])
    assert native.hv_exact(pts2, np.zeros(2)) == pytest.approx(3.0)


def test_hv_batch():
    rng = np.random.default_rng(3)
    fronts = np.stack([_random_front(rng, 20, 3)[:20] for _ in range(5)])
    ref = np.zeros(3)
    got = native.hv_exact_batch(fronts, ref)
    assert got is not None
    for i in range(5):
        assert got[i] == pytest.approx(_hv_wfg(fronts[i], ref), rel=1e-9)


def test_hypervolume_dispatches_native():
    pts = np.array([[1.0, 2.0, 1.0], [2.0, 1.0, 1.0]])
    ref = np.zeros(3)
    assert hypervolume(pts, ref) == pytest.approx(_hv_wfg(pts, ref))


def test_pareto_mask_matches_jnp():
    rng = np.random.default_rng(11)
    for d in (2, 4):
        pts = np.vstack([_random_front(rng, 50, d), _random_front(rng, 50, d)[:10]])
        got = native.pareto_mask(pts)
        want = np.asarray(non_dominated_mask(pts))
        np.testing.assert_array_equal(got, want)


def test_pareto_mask_keeps_duplicates():
    pts = np.array([[1.0, 1.0], [1.0, 1.0], [0.5, 0.5]])
    got = native.pareto_mask(pts)
    np.testing.assert_array_equal(got, [True, True, False])
