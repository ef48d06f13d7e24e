"""DynamicBicycle2D (Fiala tires) and DriftingCar tests vs reference formulas."""

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_tpu.core.spec import DRIFTING_CAR, DYNAMIC_BICYCLE_2D, make_spec
from safe_control_tpu.dynamics import get_model
from safe_control_tpu.dynamics import dynamic_bicycle2d as dyn

DT = 0.02


def _np_lateral_force(alpha, Cc, Fz, Fx, mu, gamma=0.99):
    """Reference Fiala model (dynamic_bicycle2D.py:178-196)."""
    Fy_max = np.sqrt(max((mu * Fz) ** 2 - gamma * Fx**2, 1.0))
    alpha_sl = np.arctan(3 * Fy_max / Cc)
    tan_a = np.tan(alpha)
    if abs(alpha) < alpha_sl:
        return (
            -Cc * tan_a
            + (Cc**2 / (3 * Fy_max)) * abs(tan_a) * tan_a
            - (Cc**3 / (27 * Fy_max**2)) * tan_a**3
        )
    return -Fy_max * np.sign(alpha)


def test_fiala_lateral_force_both_branches():
    spec = make_spec(DYNAMIC_BICYCLE_2D)
    Fz_f, Fz_r = dyn.normal_forces(spec)
    # Linear region
    for alpha in [0.01, -0.03, 0.06]:
        ours = float(dyn.lateral_force(jnp.asarray(alpha), spec.cc_f, Fz_f, 0.0, spec))
        ref = _np_lateral_force(alpha, 80000.0, float(Fz_f), 0.0, 1.0)
        np.testing.assert_allclose(ours, ref, rtol=1e-4)
    # Saturated region (large slip)
    for alpha in [0.5, -0.7]:
        ours = float(dyn.lateral_force(jnp.asarray(alpha), spec.cc_f, Fz_f, 0.0, spec))
        ref = _np_lateral_force(alpha, 80000.0, float(Fz_f), 0.0, 1.0)
        np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_low_friction_reduces_forces():
    """Friction puddles (drifting_env.py:435-484) act through spec.mu."""
    spec_hi = make_spec(DYNAMIC_BICYCLE_2D, mu=1.0)
    spec_lo = make_spec(DYNAMIC_BICYCLE_2D, mu=0.3)
    Fz_f, _ = dyn.normal_forces(spec_hi)
    alpha = jnp.asarray(0.5)  # saturated
    f_hi = abs(float(dyn.lateral_force(alpha, spec_hi.cc_f, Fz_f, 0.0, spec_hi)))
    f_lo = abs(float(dyn.lateral_force(alpha, spec_lo.cc_f, Fz_f, 0.0, spec_lo)))
    assert f_lo < 0.35 * f_hi
    # Longitudinal soft saturation too
    fx_hi = float(dyn.longitudinal_force(jnp.asarray(5000.0), Fz_f, spec_hi))
    fx_lo = float(dyn.longitudinal_force(jnp.asarray(5000.0), Fz_f, spec_lo))
    assert fx_lo < fx_hi


def test_state_clamps():
    model = get_model(DYNAMIC_BICYCLE_2D)
    spec = make_spec(DYNAMIC_BICYCLE_2D)
    x = jnp.array([5.0, 2.0, 100.0, 2.0, 99999.0])  # wildly out of range
    out = np.asarray(model.step(x, jnp.zeros(2), spec, DT))
    assert abs(out[0]) <= 2.0 + 1e-5
    assert abs(out[1]) <= float(spec.beta_max) + 1e-5
    assert 0.5 - 1e-5 <= out[2] <= 30.0 + 1e-5
    assert abs(out[3]) <= float(spec.delta_max) + 1e-5
    assert abs(out[4]) <= 5000.0 + 1e-5


def test_drifting_car_straight_line():
    """Constant torque, zero steering: the car accelerates straight ahead."""
    model = get_model(DRIFTING_CAR)
    spec = make_spec(DRIFTING_CAR)
    x = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 5.0, 0.0, 1000.0])
    step = jax.jit(lambda x: model.step(x, jnp.zeros(2), spec, DT))
    for _ in range(100):
        x = step(x)
    xf = np.asarray(x)
    assert xf[0] > 9.0  # moved forward
    assert abs(xf[1]) < 0.1  # no lateral drift
    assert xf[5] > 5.0  # accelerated


def test_drifting_car_nominal_turns_toward_goal():
    model = get_model(DRIFTING_CAR)
    spec = make_spec(DRIFTING_CAR)
    x = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 5.0, 0.0, 0.0])
    goal = jnp.array([10.0, 10.0])  # up-left => positive heading error
    u = np.asarray(model.nominal_input(x, goal, spec))
    assert u[0] > 0  # steer left
    step = jax.jit(lambda x, u: model.step(x, u, spec, DT))
    min_goal_dist = np.inf
    for _ in range(250):
        u = model.nominal_input(x, goal, spec)
        x = step(x, u)
        min_goal_dist = min(
            min_goal_dist, float(jnp.linalg.norm(x[:2] - goal))
        )
    assert min_goal_dist < 2.0  # the P law drives the car to the goal


def test_full_state_affine_consistency():
    """f_full + g_full @ u must match the wrapped dynamics derivative
    (drifting_car.py:405-464)."""
    model = get_model(DRIFTING_CAR)
    spec = make_spec(DRIFTING_CAR)
    x = jnp.array([1.0, 2.0, 0.3, 0.1, 0.05, 8.0, 0.1, 500.0])
    u = jnp.array([0.2, 100.0])
    fx = np.asarray(model.f(x, spec))
    gx = np.asarray(model.g(x, spec))
    xdot = fx + gx @ np.asarray(u)
    # position derivatives from kinematic coupling
    V, beta, theta = 8.0, 0.05, 0.3
    np.testing.assert_allclose(xdot[0], V * np.cos(theta + beta), rtol=1e-5)
    np.testing.assert_allclose(xdot[1], V * np.sin(theta + beta), rtol=1e-5)
    np.testing.assert_allclose(xdot[2], 0.1, rtol=1e-5)
    # control only reaches delta/tau rows
    assert np.allclose(gx[:6], 0.0)
    assert gx[6, 0] == 1.0 and gx[7, 1] == 1.0


def test_mpcc_scan_unroll_envelope():
    """``MPCCConfig.scan_unroll`` is a scheduling knob: the unrolled rollout
    must agree with the default scan lowering to f32 op-ordering noise
    (same envelope class as MPCConfig.scan_unroll, tests/test_mpc_cbf.py)."""
    from safe_control_tpu.solvers import al_gn, mpcc

    spec = make_spec(DRIFTING_CAR)
    sx = np.linspace(0.0, 80.0, 241)
    path = mpcc.make_path(sx, np.full_like(sx, 2.0))
    x8 = jnp.asarray(np.array([5.0, 2.0, 0, 0, 0, 10.0, 0, 0], np.float32))
    us = []
    # Reduced budget/horizon: the envelope property (scheduling-only knob)
    # is budget-independent, and the full 12x4 program is compile-heavy.
    al = al_gn.ALGNConfig(outer_iters=3, newton_iters=2)
    for unroll in (1, 8):
        cfg = mpcc.MPCCConfig(horizon=8, v_ref=10.0, scan_unroll=unroll, al=al)
        st = mpcc.init_state(cfg)
        r = jax.jit(lambda x, _cfg=cfg, _st=st: mpcc.solve(
            spec, x, path, _st, jnp.zeros(2), 0.05, _cfg).u)(x8)
        us.append(np.asarray(r))
    assert np.max(np.abs(us[0] - us[1])) < 5e-3
