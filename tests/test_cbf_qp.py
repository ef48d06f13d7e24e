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


# ---------------------------------------------------------------- hard mode
def _qp_active_set_golden(u_ref, rows, lb, ub):
    """Exact f64 optimum of min ||u-u_ref||^2 s.t. A u + b >= 0, box, for
    2-var QPs, by enumerating all active sets of size <= 2 and checking
    primal feasibility + dual nonnegativity (same machinery as the
    committed golden generator, tests/data/gen_parity_goldens.py)."""
    from itertools import combinations

    u_ref = np.asarray(u_ref, float)
    G_rows, h_rows = [], []
    for a_i, b_i in rows:
        G_rows.append(np.asarray(a_i, float))
        h_rows.append(-float(b_i))
    for i in range(2):
        e = np.zeros(2)
        e[i] = 1.0
        G_rows.append(e.copy())
        h_rows.append(float(lb[i]))
        G_rows.append(-e)
        h_rows.append(-float(ub[i]))
    G, h = np.stack(G_rows), np.asarray(h_rows)

    def feasible(u):
        return np.all(G @ u - h >= -1e-10)

    best = u_ref.copy() if feasible(u_ref) else None
    for k in (1, 2):
        for S in combinations(range(G.shape[0]), k):
            Gs = G[list(S)]
            M = Gs @ Gs.T
            if abs(np.linalg.det(M)) < 1e-12:
                continue
            lam = np.linalg.solve(M, 2.0 * (h[list(S)] - Gs @ u_ref))
            if np.any(lam < -1e-10):
                continue
            u = u_ref + Gs.T @ lam / 2.0
            if feasible(u) and (
                best is None
                or (u - u_ref) @ (u - u_ref) < (best - u_ref) @ (best - u_ref) - 1e-15
            ):
                best = u
    return best


def test_hard_mode_di_matches_active_set_golden():
    """``cbf_mode='hard'`` r=2 rows (cbf_qp.py:170-177): h(x_{k+2}) >= 0 via
    2nd-order Taylor, A = dh_dot_dx @ g, b = h/dt^2 + 2 h_dot/dt +
    dh_dot_dx @ f.  Anchors come from the repo's own closed-loop hard-mode
    drive (so they sit on realistic approach states, same policy as the
    committed goldens) and each is certified against an exact f64
    active-set optimum built from INDEPENDENT NumPy rows; at least 3
    anchors must have the hard constraint genuinely binding."""
    from safe_control_tpu.core.spec import SINGLE_INTEGRATOR_2D

    spec = make_spec(DOUBLE_INTEGRATOR_2D)
    model = get_model(DOUBLE_INTEGRATOR_2D)
    obs_np = np.array([[3.0, 0.2, 0.5, 0, 0, 0, 0], [4.5, -0.5, 0.4, 0, 0, 0, 0]])
    obs = pad_obstacles(jnp.asarray(obs_np, jnp.float32), K)
    beta, rr = 1.01, float(spec.radius)

    def di_hard_row(x, o):
        diff = x[:2] - o[:2]
        h = diff @ diff - beta * (o[2] + rr) ** 2
        h_dot = 2.0 * diff @ x[2:4]
        A = 2.0 * diff  # dh_dot_dx @ g
        b = h / DT**2 + 2.0 * h_dot / DT + 2.0 * x[2:4] @ x[2:4]
        return A, b

    goal = jnp.array([6.0, 0.4], jnp.float32)
    solve_h = jax.jit(lambda x, u: cbf_qp.solve(
        DOUBLE_INTEGRATOR_2D, spec, x, u, obs, DT, mode="hard"))
    nom = jax.jit(lambda x: model.nominal_input(x, goal, spec))
    stp = jax.jit(lambda x, u: model.step(x, u, spec, DT))
    x = jnp.array([0.3, 0.0, 0.0, 0.0], jnp.float32)
    checked = binding = 0
    for k in range(300):
        u_ref = nom(x)
        res = solve_h(x, u_ref)
        if k % 5 == 0:
            x64 = np.asarray(x, float)
            ur64 = np.asarray(u_ref, float)
            rows = [di_hard_row(x64, o) for o in obs_np]
            gold = _qp_active_set_golden(ur64, rows, [-1.0, -1.0], [1.0, 1.0])
            if gold is not None:
                assert bool(res.feasible)
                np.testing.assert_allclose(np.asarray(res.u), gold, atol=2e-3)
                checked += 1
                if np.linalg.norm(gold - np.clip(ur64, -1, 1)) > 1e-6:
                    binding += 1
        x = stp(x, res.u)
    assert checked >= 30
    assert binding >= 3, f"only {binding} anchors had the hard row binding"

    # r=1 variant (cbf_qp.py:158-161): A = dh @ g, b = h/dt + dh @ f —
    # binding anchor: approach keeps h small, so h/dt caps the inward speed.
    spec_si = make_spec(SINGLE_INTEGRATOR_2D)
    obs1 = pad_obstacles(jnp.asarray(obs_np[:1], jnp.float32), K)
    x_np = np.array([2.24, 0.2])
    uref_np = np.array([1.0, 0.0])
    diff = x_np - obs_np[0, :2]
    h = diff @ diff - beta * (obs_np[0, 2] + float(spec_si.radius)) ** 2
    gold = _qp_active_set_golden(
        uref_np, [(2.0 * diff, h / DT)], [-1.0, -1.0], [1.0, 1.0]
    )
    assert gold is not None and np.linalg.norm(gold - uref_np) > 1e-6
    res = cbf_qp.solve(
        SINGLE_INTEGRATOR_2D, spec_si,
        jnp.asarray(x_np, jnp.float32), jnp.asarray(uref_np, jnp.float32),
        obs1, DT, mode="hard",
    )
    np.testing.assert_allclose(np.asarray(res.u), gold, atol=2e-3)


def test_hard_mode_through_wrapper():
    """``cbf_mode: 'hard'`` in robot_spec reaches the QP through the jitted
    tracker (the reference selects it the same way, cbf_qp.py:120), and the
    closed-loop drive stays collision-free."""
    from safe_control_tpu.sim.controller import LocalTrackingController

    obs_np = np.array([[3.0, -0.45, 0.45, 0, 0, 0, 0]])
    runs = {}
    for mode in ("cbf", "hard"):
        ctrl = LocalTrackingController(
            np.array([0.0, 0.0, 0.6, 0.0]),
            # hard mode's one-step h(x_next)>=0 row brakes LATE (it is
            # an "infinite alpha" constraint, cbf_qp.py:139): at v_max=1.0
            # the braking distance exceeds the activation margin and the QP
            # goes genuinely infeasible mid-approach (the reference's
            # Gurobi hits the same wall) — so the scenario uses a gentler
            # speed/decel envelope where hard mode is physically feasible.
            {"model": "DoubleIntegrator2D", "cbf_mode": mode, "radius": 0.25,
             "v_max": 0.5, "a_max": 2.0},
            controller_type={"pos": "cbf_qp"}, dt=DT,
        )
        ctrl.obs = obs_np.astype(float)
        ctrl.set_waypoints([[6.0, 0.8]])
        traj = []
        for _ in range(500):
            ret = ctrl.control_step()
            traj.append(ctrl.robot_state.copy())
            if ret == -1:
                break
        traj = np.stack(traj)
        clear = np.min(
            np.linalg.norm(traj[:, :2] - obs_np[0, :2], axis=1)
        ) - obs_np[0, 2] - 0.25
        assert clear > 0.0, f"{mode}: collision (clearance {clear:.3f})"
        assert np.linalg.norm(traj[-1, :2] - [6.0, 0.8]) < 0.35
        runs[mode] = traj
    # The two constraint forms must produce measurably different avoidance
    # trajectories — otherwise the spec key is not actually plumbed.
    L = min(len(runs["cbf"]), len(runs["hard"]))
    assert np.max(np.abs(runs["cbf"][:L] - runs["hard"][:L])) > 1e-3
