"""LinearSupport (OLS/GPI-LS) unit tests against a known synthetic CCS.

Models the reference's test_ols (tests/test_algos.py:133-161) without the RL
inner loop: the 'oracle' returns the best vector from a known set for any
weight; OLS must recover the full convex coverage set.
"""

import numpy as np
import pytest

from morl_baselines_tpu.outer import LinearSupport

KNOWN = np.array([[10.0, 0.0], [8.0, 6.0], [4.0, 9.0], [0.0, 10.0], [3.0, 3.0]])
# (3,3) is convex-dominated and must not end up in the CCS


def oracle(w):
    return KNOWN[np.argmax(KNOWN @ w)]


def test_ols_recovers_ccs():
    ols = LinearSupport(num_objectives=2, epsilon=1e-6)
    for _ in range(20):
        w = ols.next_weight("ols")
        if w is None:
            break
        ols.add_solution(oracle(w), w)
    ccs = np.array(sorted(map(tuple, ols.ccs)))
    expect = np.array(sorted(map(tuple, KNOWN[:4])))
    np.testing.assert_allclose(ccs, expect, atol=1e-6)
    assert ols.ended()


def test_corner_weights_geometry():
    ls = LinearSupport(num_objectives=2)
    ls.visited_weights = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
    ls.ccs = [np.array([10.0, 0.0]), np.array([0.0, 10.0])]
    ls.weight_support = list(ls.visited_weights)
    corners = ls.compute_corner_weights()
    # the two value vectors cross at w = (0.5, 0.5); extrema also appear
    assert any(np.allclose(c, [0.5, 0.5], atol=1e-4) for c in corners)


def test_max_value_lp():
    ls = LinearSupport(num_objectives=2)
    ls.visited_weights = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
    ls.ccs = [np.array([10.0, 0.0]), np.array([0.0, 10.0])]
    ls.weight_support = list(ls.visited_weights)
    # upper bound at (0.5, 0.5): v <= (10, 10) elementwise -> w.v <= 10
    ub = ls.max_value_lp(np.array([0.5, 0.5]))
    assert ub == pytest.approx(10.0, abs=1e-5)


def test_gpi_ls_priority_uses_evaluator():
    ls = LinearSupport(num_objectives=2, epsilon=None)
    ls.add_solution(np.array([10.0, 0.0]), np.array([1.0, 0.0]))
    ls.add_solution(np.array([0.0, 10.0]), np.array([0.0, 1.0]))
    calls = {}

    def gpi_eval(ws):
        calls["ws"] = ws
        return np.tile(np.array([[6.0, 6.0]]), (len(ws), 1))

    w = ls.next_weight("gpi-ls", gpi_evaluator=gpi_eval)
    assert w is not None
    assert "ws" in calls  # batched evaluation happened
    # GPI-LS priority geometry: at the corner (0.5, 0.5) the GPI value 6
    # exceeds the CCS value 5 (positive priority), while at the extrema the
    # GPI value 6 is below the CCS value 10 (negative) — so the corner must
    # be selected.
    np.testing.assert_allclose(w, [0.5, 0.5], atol=1e-4)


def test_dominated_solution_discarded():
    ls = LinearSupport(num_objectives=2)
    ls.add_solution(np.array([10.0, 10.0]), np.array([0.5, 0.5]))
    ls.add_solution(np.array([1.0, 1.0]), np.array([0.6, 0.4]))
    assert len(ls.ccs) == 1
    np.testing.assert_allclose(ls.ccs[0], [10.0, 10.0])
