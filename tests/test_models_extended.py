"""Tests for the extended model families: C3BF, DPCBF, Quad2D/3D, VTOL2D,
Manipulator2D.  Barrier values are checked against independent NumPy
implementations of the reference formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_tpu.core.spec import (
    KINEMATIC_BICYCLE_2D_C3BF,
    KINEMATIC_BICYCLE_2D_DPCBF,
    MANIPULATOR_2D,
    QUAD_2D,
    QUAD_3D,
    VTOL_2D,
    make_spec,
)
from safe_control_tpu.core.types import pad_obstacles
from safe_control_tpu.dynamics import get_model
from safe_control_tpu.solvers import cbf_qp

DT = 0.05


def test_c3bf_h_value_matches_reference_formula():
    """kinematic_bicycle2D_c3bf.py:42-66 with beta=1.0 (continuous)."""
    model = get_model(KINEMATIC_BICYCLE_2D_C3BF)
    spec = make_spec(KINEMATIC_BICYCLE_2D_C3BF)
    x = np.array([1.0, 2.0, 0.5, 2.0])
    obs = np.array([4.0, 3.0, 0.4, -0.5, 0.3, 0.0, 0.0])
    h = float(model.ct_h(jnp.asarray(x), jnp.asarray(obs), spec))

    theta, v = x[2], x[3]
    ego = (obs[2] + 0.3) * 1.0  # radius=0.3, beta=1.0
    p_rel = obs[:2] - x[:2]
    v_rel = np.array([obs[3] - v * np.cos(theta), obs[4] - v * np.sin(theta)])
    p_mag, v_mag = np.linalg.norm(p_rel), np.linalg.norm(v_rel)
    eps = 1e-6
    sqrt_term = np.sqrt(max(p_mag**2 - ego**2, eps))
    exp = p_rel @ v_rel + p_mag * v_mag * sqrt_term / (p_mag + eps)
    assert abs(h - exp) < 1e-4

    # gradient finite and pushing the right way (finite-diff check)
    grad = np.asarray(
        jax.grad(lambda q: model.ct_h(q, jnp.asarray(obs), spec))(jnp.asarray(x))
    )
    for i in range(4):
        d = np.zeros(4)
        d[i] = 1e-4
        fd = (
            float(model.ct_h(jnp.asarray(x + d), jnp.asarray(obs), spec))
            - float(model.ct_h(jnp.asarray(x - d), jnp.asarray(obs), spec))
        ) / 2e-4
        assert abs(grad[i] - fd) < 2e-2 * max(1.0, abs(fd))


def test_dpcbf_h_value_matches_reference_formula():
    """kinematic_bicycle2D_dpcbf.py:42-75 with s=1.05."""
    model = get_model(KINEMATIC_BICYCLE_2D_DPCBF)
    spec = make_spec(KINEMATIC_BICYCLE_2D_DPCBF)
    x = np.array([0.0, 0.0, 0.3, 1.5])
    obs = np.array([3.0, 1.0, 0.5, -1.0, 0.0, 0.0, 0.0])
    h = float(model.ct_h(jnp.asarray(x), jnp.asarray(obs), spec))

    s = 1.05
    ego = (obs[2] + 0.3) * s
    theta, v = x[2], x[3]
    p_rel = obs[:2] - x[:2]
    v_rel = np.array([obs[3] - v * np.cos(theta), obs[4] - v * np.sin(theta)])
    p_mag, v_mag = np.linalg.norm(p_rel), np.linalg.norm(v_rel)
    rot = np.arctan2(p_rel[1], p_rel[0])
    R = np.array([[np.cos(rot), np.sin(rot)], [-np.sin(rot), np.cos(rot)]])
    vx_p, vy_p = R @ v_rel
    d_safe = max(p_mag**2 - ego**2, 1e-6)
    lam = 0.1 * np.sqrt(d_safe) / v_mag * np.sqrt(s**2 - 1) / ego
    mu = 0.5 * np.sqrt(d_safe) * np.sqrt(s**2 - 1) / ego
    exp = vx_p + lam * vy_p**2 + mu
    assert abs(h - exp) < 1e-4


def test_c3bf_cbf_qp_avoids_head_on_obstacle():
    """Closed loop: KB robot vs an obstacle driving straight at it."""
    spec = make_spec(KINEMATIC_BICYCLE_2D_C3BF)
    model = get_model(KINEMATIC_BICYCLE_2D_C3BF)
    obs0 = np.array([[8.0, 0.1, 0.4, -1.0, 0.0, 0.0, 0.0]])

    @jax.jit
    def ctrl(x, obs):
        u_ref = model.nominal_input(x, jnp.array([12.0, 0.0]), spec)
        return cbf_qp.solve(KINEMATIC_BICYCLE_2D_C3BF, spec, x, u_ref, obs, DT)

    x = jnp.array([0.0, 0.0, 0.0, 1.0])
    obs = obs0.copy()
    min_dist = np.inf
    for _ in range(300):
        res = ctrl(x, pad_obstacles(jnp.asarray(obs), 5))
        x = model.step(x, res.u, spec, DT)
        obs[0, :2] += obs[0, 3:5] * DT  # constant-velocity obstacle
        d = np.linalg.norm(np.asarray(x[:2]) - obs[0, :2]) - obs[0, 2]
        min_dist = min(min_dist, d)
    # ZOH discretization at ~4 m/s closing speed can graze the C3BF cone
    # boundary by O(v*dt); require 95% of the nominal clearance.
    assert min_dist > 0.95 * float(spec.radius), f"min clearance {min_dist}"


def test_dpcbf_cbf_qp_avoids_crossing_obstacle():
    spec = make_spec(KINEMATIC_BICYCLE_2D_DPCBF)
    model = get_model(KINEMATIC_BICYCLE_2D_DPCBF)
    obs0 = np.array([[6.0, -3.0, 0.4, 0.0, 1.0, 0.0, 0.0]])  # crossing from below

    @jax.jit
    def ctrl(x, obs):
        u_ref = model.nominal_input(x, jnp.array([12.0, 0.0]), spec)
        return cbf_qp.solve(KINEMATIC_BICYCLE_2D_DPCBF, spec, x, u_ref, obs, DT)

    x = jnp.array([0.0, 0.0, 0.0, 1.5])
    obs = obs0.copy()
    min_dist = np.inf
    for _ in range(300):
        res = ctrl(x, pad_obstacles(jnp.asarray(obs), 5))
        x = model.step(x, res.u, spec, DT)
        obs[0, :2] += obs[0, 3:5] * DT
        d = np.linalg.norm(np.asarray(x[:2]) - obs[0, :2]) - obs[0, 2]
        min_dist = min(min_dist, d)
    assert min_dist > 0.95 * float(spec.radius), f"min clearance {min_dist}"


def test_quad2d_hover_nominal():
    """At rest at the goal the nominal input must hover: F_r+F_l ~ m*g."""
    model = get_model(QUAD_2D)
    spec = make_spec(QUAD_2D, f_min=3.0, f_max=10.0)
    x = jnp.zeros(6)
    u = np.asarray(model.nominal_input(x, jnp.array([0.0, 0.0]), spec))
    assert abs(u.sum() - 1.0 * 9.81) < 1e-3
    assert abs(u[0] - u[1]) < 1e-5


def test_quad3d_rk4_matches_numpy():
    model = get_model(QUAD_3D)
    spec = make_spec(QUAD_3D)
    x = np.linspace(-0.1, 0.1, 12)
    u = np.array([1.0, 2.0, 0.5, -0.5])

    A = np.zeros((12, 12))
    for i in range(6):
        A[i, i + 6] = 1
    A[6, 3] = 9.8
    A[7, 4] = -9.8
    B1 = np.zeros((12, 4))
    B1[8, 0] = 1 / 3.0
    B1[9, 1] = 1 / 0.5
    B1[10, 2] = 1 / 0.5
    B1[11, 3] = 1 / 0.5
    L, nu = 0.3, 0.1
    B2 = np.array([[1, 1, 1, 1], [0, L, 0, -L], [L, 0, -L, 0], [nu, -nu, nu, -nu]])
    B = B1 @ B2
    k1 = A @ x + B @ u
    k2 = A @ (x + DT / 2 * k1) + B @ u
    k3 = A @ (x + DT / 2 * k2) + B @ u
    k4 = A @ (x + DT * k3) + B @ u
    exp = x + DT / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
    exp[3:6] = (exp[3:6] + np.pi) % (2 * np.pi) - np.pi

    out = np.asarray(model.step(jnp.asarray(x), jnp.asarray(u), spec, DT))
    np.testing.assert_allclose(out, exp, rtol=1e-5, atol=1e-6)


def test_vtol_level_flight_forces():
    """Sanity on the aero model: in fast level flight with small alpha the
    drift must produce lift opposing gravity and drag opposing motion."""
    model = get_model(VTOL_2D)
    spec = make_spec(VTOL_2D)
    x = jnp.array([0.0, 50.0, 0.0, 15.0, 0.0, 0.0])  # level, 15 m/s
    fx = np.asarray(model.f(x, spec))
    assert fx[3] < 0  # drag decelerates
    assert fx[4] > -9.81  # lift partially cancels gravity
    # control matrix: pusher accelerates forward, rotors lift
    gx = np.asarray(model.g(x, spec))
    assert gx[3, 2] > 0  # pusher along +x at theta=0
    assert gx[4, 0] > 0 and gx[4, 1] > 0  # vertical rotors lift
    assert gx[5, 0] > 0 and gx[5, 1] < 0  # opposite pitch moments


def test_manipulator_fk_and_barrier_rows():
    model = get_model(MANIPULATOR_2D)
    spec = make_spec(MANIPULATOR_2D)
    x = jnp.array([0.0, 0.0, 0.0])  # fully extended along +x
    ee = np.asarray(model.end_effector(x, spec))
    total = (80 + 70 + 50) / 60.0
    np.testing.assert_allclose(ee, [total, 0.0], atol=1e-6)

    # 23 sampled circles, centers on the x axis
    centers = np.asarray(model.link_circle_centers(x, spec))
    assert centers.shape == (23, 2)
    np.testing.assert_allclose(centers[:, 1], 0.0, atol=1e-6)

    # CBF-QP with an obstacle near the arm must produce a filtered input
    obs = pad_obstacles(jnp.asarray([[1.5, 0.5, 0.3, 0, 0, 0, 0]]), 5)
    u_ref = jnp.array([0.0, 0.0, 0.5])  # sweep link 3 toward obstacle
    res = cbf_qp.solve(MANIPULATOR_2D, spec, x, u_ref, obs, DT)
    assert bool(res.feasible)
    assert np.isfinite(np.asarray(res.u)).all()


def test_manipulator_ik_nominal_moves_toward_goal():
    model = get_model(MANIPULATOR_2D)
    spec = make_spec(MANIPULATOR_2D, kp=5.0)
    x = jnp.array([0.3, -0.2, 0.1])
    goal = jnp.array([1.0, 1.0])
    u = model.nominal_input(x, goal, spec)
    ee0 = np.asarray(model.end_effector(x, spec))
    x1 = model.step(x, u, spec, DT)
    ee1 = np.asarray(model.end_effector(x1, spec))
    assert np.linalg.norm(ee1 - np.asarray(goal)) < np.linalg.norm(
        ee0 - np.asarray(goal)
    )


@pytest.mark.parametrize(
    "name",
    [QUAD_2D, QUAD_3D, VTOL_2D, KINEMATIC_BICYCLE_2D_C3BF, KINEMATIC_BICYCLE_2D_DPCBF, MANIPULATOR_2D],
)
def test_new_models_jit_vmap(name):
    model = get_model(name)
    spec = make_spec(name)
    xs = jnp.ones((8, model.N_STATES)) * 0.1
    us = jnp.ones((8, model.N_CONTROLS)) * 0.1
    out = jax.jit(jax.vmap(lambda x, u: model.step(x, u, spec, DT)))(xs, us)
    assert out.shape == (8, model.N_STATES)
    assert np.isfinite(np.asarray(out)).all()
