"""CBF-QP safety-filter tests: QP semantics + safety invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_tpu.core.spec import (
    DOUBLE_INTEGRATOR_2D,
    DYNAMIC_UNICYCLE_2D,
    make_spec,
)
from safe_control_tpu.core.types import pad_obstacles
from safe_control_tpu.dynamics import get_model
from safe_control_tpu.solvers import cbf_qp

DT = 0.05
K = 10


def test_no_obstacle_returns_clipped_reference():
    spec = make_spec(DYNAMIC_UNICYCLE_2D)
    obs = pad_obstacles(jnp.zeros((0, 7)), K)
    x = jnp.array([0.0, 0.0, 0.0, 0.5])
    u_ref = jnp.array([0.3, 0.1])
    res = cbf_qp.solve(DYNAMIC_UNICYCLE_2D, spec, x, u_ref, obs, DT)
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(u_ref), atol=1e-4)
    assert bool(res.feasible)

    # Out-of-box reference gets clipped to input limits (a_max=0.5, w_max=0.5).
    u_big = jnp.array([2.0, -2.0])
    res2 = cbf_qp.solve(DYNAMIC_UNICYCLE_2D, spec, x, u_big, obs, DT)
    np.testing.assert_allclose(np.asarray(res2.u), [0.5, -0.5], atol=1e-4)


def test_active_obstacle_filters_input():
    """Heading at an obstacle: filtered accel must satisfy the active CBF row.

    Analytic expected bound: for the r=2 circle HOCBF of DynamicUnicycle2D the
    row is -2d·a + 2v² - (α1+α2)·2dv + α1α2·(d²-β·d_min²) >= 0.
    """
    spec = make_spec(DYNAMIC_UNICYCLE_2D)
    obs = pad_obstacles(jnp.array([[3.5, 0.0, 0.5, 0, 0, 0, 0]]), K)
    x = jnp.array([1.0, 0.0, 0.0, 1.0])  # 2.5 m away, moving at v_max toward it
    u_ref = jnp.array([0.5, 0.0])  # full acceleration toward obstacle
    res = cbf_qp.solve(DYNAMIC_UNICYCLE_2D, spec, x, u_ref, obs, DT)
    assert bool(res.feasible)
    assert float(res.h_min) >= -1e-4  # constraint satisfied at solution
    d, v = 2.5, 1.0
    beta, d_min = 1.01, 0.75
    a_bound = (2 * v**2 - 6 * d * v + 2.25 * (d**2 - beta * d_min**2)) / (2 * d)
    np.testing.assert_allclose(float(res.u[0]), a_bound, atol=1e-3)
    np.testing.assert_allclose(float(res.u[1]), 0.0, atol=1e-4)


def test_infeasible_reports_status():
    """Too fast, too close: the QP has no feasible input and must say so
    (the reference propagates solver status, tracking.py:626-634)."""
    spec = make_spec(DYNAMIC_UNICYCLE_2D)
    obs = pad_obstacles(jnp.array([[2.0, 0.0, 0.5, 0, 0, 0, 0]]), K)
    x = jnp.array([1.0, 0.0, 0.0, 1.0])
    u_ref = jnp.array([0.5, 0.0])
    res = cbf_qp.solve(DYNAMIC_UNICYCLE_2D, spec, x, u_ref, obs, DT)
    assert not bool(res.feasible)


def test_closed_loop_no_collision_double_integrator():
    """Drive a DI robot at an obstacle under the filter for 400 steps: the
    distance must never drop below the collision threshold (scenario predicate
    from SURVEY.md §4)."""
    spec = make_spec(DOUBLE_INTEGRATOR_2D, a_max=1.5, v_max=1.0)
    model = get_model(DOUBLE_INTEGRATOR_2D)
    obs_np = np.array([[3.0, 0.0, 0.4, 0, 0, 0, 0]])
    obs = pad_obstacles(jnp.asarray(obs_np), K)
    goal = jnp.array([6.0, 0.0])

    @jax.jit
    def step(x):
        u_ref = model.nominal_input(x, goal, spec)
        res = cbf_qp.solve(DOUBLE_INTEGRATOR_2D, spec, x, u_ref, obs, DT)
        return model.step(x, res.u, spec, DT), res

    x = jnp.array([0.0, 0.05, 0.0, 0.0])
    min_dist = np.inf
    for _ in range(400):
        x, res = step(x)
        d = np.linalg.norm(np.asarray(x[:2]) - obs_np[0, :2])
        min_dist = min(min_dist, d)
    assert min_dist > obs_np[0, 2] + float(spec.radius)  # no collision
    # and the robot must actually make progress around the obstacle
    assert float(x[0]) > 3.0


@pytest.mark.slow
def test_batched_solve_matches_single():
    spec = make_spec(DYNAMIC_UNICYCLE_2D)
    obs = pad_obstacles(jnp.array([[2.0, 0.5, 0.5, 0, 0, 0, 0]]), K)
    xs = jnp.stack(
        [jnp.array([1.0, 0.0, 0.0, 1.0]), jnp.array([0.0, 0.0, 0.3, 0.5])]
    )
    u_refs = jnp.stack([jnp.array([0.5, 0.0]), jnp.array([0.1, 0.2])])
    obs_b = jnp.stack([obs, obs])
    batch = cbf_qp.solve_batch(DYNAMIC_UNICYCLE_2D, spec, xs, u_refs, obs_b, DT)
    for i in range(2):
        single = cbf_qp.solve(DYNAMIC_UNICYCLE_2D, spec, xs[i], u_refs[i], obs, DT)
        # f32 op reordering under vmap costs a few 1e-5 of agreement
        np.testing.assert_allclose(
            np.asarray(batch.u[i]), np.asarray(single.u), atol=2e-4
        )
