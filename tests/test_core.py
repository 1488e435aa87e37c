"""Property tests for Pareto pruning, indicators, weights, scalarization.

Models the reference's tests/test_pruning.py: generate a known non-dominated
set on the positive unit ball plus dominated distractors, assert the pruning
mask recovers exactly the known set; plus exactness checks for hypervolume
against hand-computed values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morl_baselines_tpu.core import (
    DeviceParetoFront,
    ParetoArchive,
    cardinality,
    equally_spaced_weights,
    expected_utility,
    extrema_weights,
    filter_pareto_dominated,
    hypervolume,
    hypervolume_2d,
    hypervolume_mc,
    igd,
    maximum_utility_loss,
    non_dominated_mask,
    pareto_dominates,
    random_weights,
    tchebicheff,
    update_utopian,
    weighted_sum,
)


def _known_front(n, d, rng):
    """Non-dominated points on the positive unit sphere (all mutually ND)."""
    x = np.abs(rng.normal(size=(n, d))) + 1e-3
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.mark.parametrize("d", [2, 4])
@pytest.mark.parametrize("n", [50, 200])
def test_pruning_recovers_known_front(d, n):
    rng = np.random.default_rng(0)
    front = _known_front(n, d, rng)
    # dominated distractors: shrink known points
    shrink = front * rng.uniform(0.3, 0.95, size=(n, 1))
    pts = np.concatenate([front, shrink])
    perm = rng.permutation(len(pts))
    pts = pts[perm]
    is_front = perm < n
    mask = np.asarray(non_dominated_mask(jnp.asarray(pts)))
    assert np.array_equal(mask, is_front)
    filtered = filter_pareto_dominated(pts)
    assert len(filtered) == n


def test_pruning_with_valid_mask():
    pts = jnp.array([[1.0, 0.0], [0.0, 1.0], [2.0, 2.0], [0.5, 0.5]])
    valid = jnp.array([True, True, False, True])
    mask = non_dominated_mask(pts, valid)
    # (2,2) invalid so cannot dominate; (0.5,0.5) survives only if not dominated
    assert bool(mask[0]) and bool(mask[1]) and not bool(mask[2]) and bool(mask[3])


def test_dominates():
    assert bool(pareto_dominates(jnp.array([1.0, 1.0]), jnp.array([0.0, 1.0])))
    assert not bool(pareto_dominates(jnp.array([1.0, 0.0]), jnp.array([0.0, 1.0])))
    assert not bool(pareto_dominates(jnp.array([1.0, 1.0]), jnp.array([1.0, 1.0])))


def test_hypervolume_2d_exact():
    front = jnp.array([[1.0, 3.0], [2.0, 2.0], [3.0, 1.0]])
    ref = jnp.array([0.0, 0.0])
    # staircase area: 1*3 + 1*2 + 1*1 = 6
    assert float(hypervolume_2d(front, ref)) == pytest.approx(6.0)
    # host exact agrees
    assert hypervolume(np.asarray(front), np.asarray(ref)) == pytest.approx(6.0)
    # dominated point changes nothing
    front2 = jnp.concatenate([front, jnp.array([[0.5, 0.5]])])
    assert float(hypervolume_2d(front2, ref)) == pytest.approx(6.0)


def test_hypervolume_2d_jit_and_mask():
    f = jax.jit(hypervolume_2d)
    front = jnp.array([[1.0, 3.0], [2.0, 2.0], [9.0, 9.0]])
    valid = jnp.array([True, True, False])
    ref = jnp.array([0.0, 0.0])
    assert float(f(front, ref, valid)) == pytest.approx(5.0)


def test_hypervolume_3d_exact_vs_mc():
    rng = np.random.default_rng(1)
    front = _known_front(20, 3, rng)
    ref = np.zeros(3)
    exact = hypervolume(front, ref)
    mc = float(hypervolume_mc(jnp.asarray(front), jnp.asarray(ref), jax.random.key(0), n_samples=200_000))
    assert exact > 0
    assert mc == pytest.approx(exact, rel=0.05)


def test_hypervolume_box_union():
    # two boxes [0,2]x[0,1] and [0,1]x[0,2]: union = 3
    pts = np.array([[2.0, 1.0], [1.0, 2.0]])
    assert hypervolume(pts, np.zeros(2)) == pytest.approx(3.0)
    # 3-d: unit cube corner + dominated
    pts3 = np.array([[1.0, 1.0, 1.0], [0.5, 0.5, 0.5]])
    assert hypervolume(pts3, np.zeros(3)) == pytest.approx(1.0)


def test_expected_utility_and_mul():
    front = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    w = jnp.array([[1.0, 0.0], [0.0, 1.0], [0.5, 0.5]])
    assert float(expected_utility(front, w)) == pytest.approx((1 + 1 + 0.5) / 3)
    ref_front = jnp.array([[1.0, 1.0]])
    mul = float(maximum_utility_loss(front, ref_front, w))
    assert mul == pytest.approx(0.5)


def test_cardinality_and_igd():
    front = jnp.array([[1.0, 0.0], [0.0, 1.0], [0.2, 0.0]])
    assert float(cardinality(front)) == 2.0
    assert float(igd(front, front)) == pytest.approx(0.0, abs=1e-6)


def test_weights():
    w = random_weights(jax.random.key(0), 3, n=100)
    assert w.shape == (100, 3)
    np.testing.assert_allclose(np.sum(np.asarray(w), -1), 1.0, rtol=1e-5)
    assert (np.asarray(w) >= 0).all()
    g = random_weights(jax.random.key(1), 3, n=10, dist="gaussian")
    np.testing.assert_allclose(np.sum(np.asarray(g), -1), 1.0, rtol=1e-5)
    eq = equally_spaced_weights(2, 11)
    assert eq.shape == (11, 2)
    np.testing.assert_allclose(eq.sum(-1), 1.0)
    eq3 = equally_spaced_weights(3, 50)
    assert eq3.shape == (50, 3)
    np.testing.assert_allclose(eq3.sum(-1), 1.0)
    assert np.array_equal(extrema_weights(3), np.eye(3))


def test_equally_spaced_weights_riesz_uniformity():
    """The s-energy optimum for dim=2 is n uniformly spaced points on the
    segment (1,0)-(0,1) including both corners (matches pymoo 'energy' sets,
    reference weights.py:38-49)."""
    w = equally_spaced_weights(2, 50)
    order = np.argsort(w[:, 0])
    gaps = np.linalg.norm(np.diff(w[order], axis=0), axis=-1)
    ideal = np.sqrt(2.0) / 49
    assert gaps.min() > 0.97 * ideal and gaps.max() < 1.03 * ideal
    assert any(np.allclose(x, [1, 0], atol=1e-6) for x in w)
    assert any(np.allclose(x, [0, 1], atol=1e-6) for x in w)
    # deterministic across calls (lru_cached but also re-computable)
    equally_spaced_weights.cache_clear()
    np.testing.assert_array_equal(w, equally_spaced_weights(2, 50))
    # higher dims: well spread — nearest-neighbour distances nearly equal
    w3 = equally_spaced_weights(3, 32)
    d = np.linalg.norm(w3[:, None] - w3[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    nn = d.min(axis=1)
    assert nn.min() > 0.85 * nn.max()


def test_scalarization():
    r = jnp.array([1.0, 2.0])
    w = jnp.array([0.5, 0.5])
    assert float(weighted_sum(r, w)) == pytest.approx(1.5)
    ut = jnp.array([3.0, 3.0])
    assert float(tchebicheff(r, w, ut)) == pytest.approx(-1.0)
    ut2 = update_utopian(ut, jnp.array([5.0, 1.0]), tau=0.5)
    np.testing.assert_allclose(np.asarray(ut2), [5.5, 3.0])


def test_device_pareto_front():
    front = DeviceParetoFront.create(8, 2)
    add = jax.jit(lambda f, c: f.add(c))
    front = add(front, jnp.array([[1.0, 0.0], [0.0, 1.0]]))
    front = add(front, jnp.array([[0.5, 0.5], [2.0, 2.0]]))
    vals = np.asarray(front.values)[np.asarray(front.valid)]
    assert len(vals) == 1
    np.testing.assert_allclose(vals[0], [2.0, 2.0])


def test_host_archive():
    arch = ParetoArchive()
    arch.add("a", np.array([1.0, 0.0]))
    arch.add("b", np.array([0.0, 1.0]))
    arch.add("c", np.array([0.5, 0.5]))
    assert len(arch) == 3
    arch.add("d", np.array([2.0, 2.0]))
    assert len(arch) == 1
    assert arch.individuals == ["d"]


def test_hypervolume_small_exact_any_d():
    """Inclusion-exclusion device HV is EXACT at any d for small N (the PQL
    d>3 action-scoring path, closing the r3 MC-fallback gap): matches the
    host WFG at d=4 and d=5, including valid masks and dominated points."""
    from morl_baselines_tpu.core.indicators import hypervolume_small_exact

    rng = np.random.default_rng(11)
    for d in (2, 3, 4, 5):
        for _ in range(3):
            front = rng.uniform(0.1, 1.0, size=(10, d))
            ref = np.zeros(d)
            exact = hypervolume(front, ref)
            dev = float(jax.jit(hypervolume_small_exact)(jnp.asarray(front), jnp.asarray(ref)))
            assert dev == pytest.approx(exact, rel=1e-4), d
    # valid mask: masked rows contribute nothing
    front = rng.uniform(0.1, 1.0, size=(8, 4))
    valid = np.array([True] * 5 + [False] * 3)
    exact = hypervolume(front[:5], np.zeros(4))
    dev = float(hypervolume_small_exact(jnp.asarray(front), jnp.zeros(4), jnp.asarray(valid)))
    assert dev == pytest.approx(exact, rel=1e-4)


def test_hypervolume_3d_device_exact():
    """Jittable 3-D slab-sweep kernel matches the exact host WFG, incl. masks."""
    from morl_baselines_tpu.core.indicators import hypervolume_3d

    rng = np.random.default_rng(3)
    for _ in range(5):
        front = rng.uniform(0.1, 1.0, size=(12, 3))
        ref = np.zeros(3)
        exact = hypervolume(front, ref)
        dev = float(jax.jit(hypervolume_3d)(jnp.asarray(front), jnp.asarray(ref)))
        assert dev == pytest.approx(exact, rel=1e-4)
    # valid-mask rows must contribute nothing
    front = rng.uniform(0.1, 1.0, size=(8, 3))
    valid = np.array([True] * 5 + [False] * 3)
    exact = hypervolume(front[:5], np.zeros(3))
    dev = float(hypervolume_3d(jnp.asarray(front), jnp.zeros(3), jnp.asarray(valid)))
    assert dev == pytest.approx(exact, rel=1e-4)
