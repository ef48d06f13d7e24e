"""Barrier value/gradient tests: autodiff vs the reference's analytic formulas.

The expected gradients are independent NumPy implementations of the
hand-derived expressions in robots/dynamic_unicycle2D.py:121-186 and
robots/double_integrator2D.py:167-220.
"""

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_tpu.barriers import geometry, hocbf
from safe_control_tpu.core.spec import (
    DOUBLE_INTEGRATOR_2D,
    DYNAMIC_UNICYCLE_2D,
    UNICYCLE_2D,
    make_spec,
)
from safe_control_tpu.core.types import pad_obstacles
from safe_control_tpu.dynamics import get_model

DT = 0.05


def circle_obs(ox, oy, r):
    return jnp.array([ox, oy, r, 0.0, 0.0, 0.0, 0.0])


def superellipsoid_obs(ox, oy, a, b, e, th):
    return jnp.array([ox, oy, a, b, e, th, 1.0])


def test_circle_h_value():
    p = jnp.array([1.0, 2.0])
    obs = circle_obs(3.0, 4.0, 0.5)
    h = float(geometry.h_circle(p, obs, robot_radius=0.25, beta=1.01))
    exp = (2.0**2 + 2.0**2) - 1.01 * 0.75**2
    assert abs(h - exp) < 1e-6


def test_superellipsoid_h_value_and_grad():
    p = jnp.array([1.0, 0.5])
    obs = superellipsoid_obs(0.0, 0.0, 1.0, 0.5, 4.0, 0.3)
    r = 0.25
    h = float(geometry.h_superellipsoid(p, obs, r))
    ct, st = np.cos(0.3), np.sin(0.3)
    px = ct * 1.0 + st * 0.5
    py = -st * 1.0 + ct * 0.5
    exp = abs(px / 1.25) ** 4 + abs(py / 0.75) ** 4 - 1
    assert abs(h - exp) < 1e-5

    # grad vs reference analytic formula (dynamic_unicycle2D.py:161-166)
    g = np.asarray(jax.grad(lambda q: geometry.h_superellipsoid(q, obs, r))(p))
    e = 4.0
    gx = e * px ** (e - 1) * (ct / 1.25**e) + e * py ** (e - 1) * (-st / 0.75**e)
    gy = e * px ** (e - 1) * (st / 1.25**e) + e * py ** (e - 1) * (ct / 0.75**e)
    np.testing.assert_allclose(g, [gx, gy], rtol=1e-4)


def test_dummy_obstacle_gradients_finite():
    """Padded dummy rows must not poison gradients through jnp.where."""
    model = get_model(DYNAMIC_UNICYCLE_2D)
    spec = make_spec(DYNAMIC_UNICYCLE_2D)
    obs = pad_obstacles(jnp.zeros((0, 7)), 5)
    x = jnp.array([1.0, 1.0, 0.3, 0.5])
    for o in obs:
        a_row, b = hocbf.ct_cbf_row(model, DYNAMIC_UNICYCLE_2D, x, o, spec, DT)
        assert np.isfinite(np.asarray(a_row)).all()
        assert np.isfinite(float(b))
        # Dummy obstacle is far away: constraint must be slack at u=0.
        assert float(b) > 0


def test_du_r2_row_vs_reference_analytic():
    """DynamicUnicycle2D circle HOCBF row vs dynamic_unicycle2D.py:131-146."""
    model = get_model(DYNAMIC_UNICYCLE_2D)
    spec = make_spec(DYNAMIC_UNICYCLE_2D)
    x = np.array([1.0, 2.0, 0.7, 0.9])
    obs_np = np.array([3.0, 3.5, 0.4, 0, 0, 0, 0])
    a_row, b = hocbf.ct_cbf_row(
        model, DYNAMIC_UNICYCLE_2D, jnp.asarray(x), jnp.asarray(obs_np), spec, DT
    )

    # Reference analytic computation
    beta, rr = 1.01, 0.25
    d_min = obs_np[2] + rr
    diff = x[:2] - obs_np[:2]
    h = diff @ diff - beta * d_min**2
    f = np.array([x[3] * np.cos(x[2]), x[3] * np.sin(x[2]), 0, 0])
    h_dot = 2 * diff @ f[:2]
    df_dx = np.array(
        [
            [0, 0, -x[3] * np.sin(x[2]), np.cos(x[2])],
            [0, 0, x[3] * np.cos(x[2]), np.sin(x[2])],
            [0, 0, 0, 0],
            [0, 0, 0, 0],
        ]
    )
    dh_dot_dx = np.concatenate([2 * f[:2], [0, 0]]) + 2 * diff @ df_dx[:2, :]
    g = np.array([[0, 0], [0, 0], [0, 1], [1, 0]])
    a_exp = dh_dot_dx @ g
    gamma1 = spec.cbf_alpha1 + spec.cbf_alpha2
    gamma2 = spec.cbf_alpha1 * spec.cbf_alpha2
    b_exp = dh_dot_dx @ f + gamma1 * h_dot + gamma2 * h

    np.testing.assert_allclose(np.asarray(a_row), a_exp, rtol=1e-5)
    np.testing.assert_allclose(float(b), b_exp, rtol=1e-5)


def test_di_r2_row_vs_reference_analytic():
    """DoubleIntegrator2D circle HOCBF row vs double_integrator2D.py:167-183."""
    model = get_model(DOUBLE_INTEGRATOR_2D)
    spec = make_spec(DOUBLE_INTEGRATOR_2D)
    x = np.array([0.5, -1.0, 0.4, 0.2])
    obs_np = np.array([2.0, 0.0, 0.3, 0, 0, 0, 0])
    a_row, b = hocbf.ct_cbf_row(
        model, DOUBLE_INTEGRATOR_2D, jnp.asarray(x), jnp.asarray(obs_np), spec, DT
    )
    beta, rr = 1.01, 0.25
    d_min = obs_np[2] + rr
    diff = x[:2] - obs_np[:2]
    h = diff @ diff - beta * d_min**2
    h_dot = 2 * diff @ x[2:4]
    dh_dot_dx = np.concatenate([2 * x[2:4], 2 * diff])
    a_exp = dh_dot_dx @ np.array([[0, 0], [0, 0], [1, 0], [0, 1]])
    f = np.array([x[2], x[3], 0, 0])
    gamma1, gamma2 = 3.0, 2.25
    b_exp = dh_dot_dx @ f + gamma1 * h_dot + gamma2 * h
    np.testing.assert_allclose(np.asarray(a_row), a_exp, rtol=1e-5)
    np.testing.assert_allclose(float(b), b_exp, rtol=1e-5)


def test_unicycle_sigma_barrier_vs_reference():
    """Unicycle2D sigmoid-shaped barrier + gradient (unicycle2D.py:100-125)."""
    model = get_model(UNICYCLE_2D)
    spec = make_spec(UNICYCLE_2D)
    x = np.array([0.2, 0.1, 0.5])
    obs_np = np.array([1.5, 1.0, 0.3, 0, 0, 0, 0])
    a_row, b = hocbf.ct_cbf_row(
        model, UNICYCLE_2D, jnp.asarray(x), jnp.asarray(obs_np), spec, DT
    )

    k1, k2, beta, rr = 0.5, 1.8, 1.01, 0.25
    d_min = obs_np[2] + rr
    diff = x[:2] - obs_np[:2]
    theta = x[2]
    s = diff @ np.array([np.cos(theta), np.sin(theta)])
    sigma = k2 * (np.exp(k1 - s) - 1) / (np.exp(k1 - s) + 1)
    h = diff @ diff - beta * d_min**2 - sigma
    der_sigma = -k2 * np.exp(k1 - s) / (1 + np.exp(k1 - s)) * (1 - sigma / k2)
    dh_dx = np.concatenate(
        [
            2 * diff - der_sigma * np.array([np.cos(theta), np.sin(theta)]),
            [-der_sigma * (-np.sin(theta) * diff[0] + np.cos(theta) * diff[1])],
        ]
    )
    g = np.array([[np.cos(theta), 0], [np.sin(theta), 0], [0, 1]])
    a_exp = dh_dx @ g
    b_exp = spec.cbf_alpha * h  # f == 0
    np.testing.assert_allclose(np.asarray(a_row), a_exp, rtol=1e-4)
    np.testing.assert_allclose(float(b), b_exp, rtol=1e-4)


def test_dt_hocbf_matches_manual_rollout():
    model = get_model(DYNAMIC_UNICYCLE_2D)
    spec = make_spec(DYNAMIC_UNICYCLE_2D)
    x = jnp.array([1.0, 1.0, 0.2, 0.6])
    u = jnp.array([0.3, -0.2])
    obs = circle_obs(2.0, 2.0, 0.3)
    val = float(hocbf.dt_hocbf_value(model, DYNAMIC_UNICYCLE_2D, x, u, obs, spec, DT))

    def h(xx):
        return float(geometry.h_circle(xx[:2], obs, spec.radius, spec.cbf_beta))

    x1 = model.step(x, u, spec, DT)
    x2 = model.step(x1, u, spec, DT)
    h0, h1, h2 = h(x), h(x1), h(x2)
    a1 = a2 = 0.15
    exp = (h2 - 2 * h1 + h0) + (a1 + a2) * (h1 - h0) + a1 * a2 * h0
    assert abs(val - exp) < 1e-5


def test_grad_check_finite_difference():
    """Spot-check autodiff vs finite differences for the r=2 row builder."""
    model = get_model(DYNAMIC_UNICYCLE_2D)
    spec = make_spec(DYNAMIC_UNICYCLE_2D)
    obs = superellipsoid_obs(2.0, 1.0, 1.0, 0.6, 2.0, 0.4)
    x0 = np.array([0.5, 0.3, 0.4, 0.7])

    def hdot(x):
        h_fn = lambda xx: hocbf.ct_h(model, DYNAMIC_UNICYCLE_2D, xx, obs, spec)
        return float(
            jax.grad(h_fn)(jnp.asarray(x)) @ model.f(jnp.asarray(x), spec)
        )

    g_auto = np.asarray(
        jax.grad(
            lambda xx: jax.grad(
                lambda q: hocbf.ct_h(model, DYNAMIC_UNICYCLE_2D, q, obs, spec)
            )(xx)
            @ model.f(xx, spec)
        )(jnp.asarray(x0))
    )
    eps = 1e-4
    g_fd = np.zeros(4)
    for i in range(4):
        dx = np.zeros(4)
        dx[i] = eps
        g_fd[i] = (hdot(x0 + dx) - hdot(x0 - dx)) / (2 * eps)
    np.testing.assert_allclose(g_auto, g_fd, rtol=2e-2, atol=1e-3)
