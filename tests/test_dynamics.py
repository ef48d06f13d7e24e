"""Dynamics parity tests vs hand-computed reference semantics (SURVEY.md §2.1).

Expected values are computed from the reference formulas directly in the test
(independent NumPy re-derivations of robots/*.py), never by importing the
reference package.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_tpu.core.spec import (
    DOUBLE_INTEGRATOR_2D,
    DYNAMIC_UNICYCLE_2D,
    KINEMATIC_BICYCLE_2D,
    SINGLE_INTEGRATOR_2D,
    UNICYCLE_2D,
    make_spec,
)
from safe_control_tpu.dynamics import get_model

DT = 0.05


def norm_angle(a):
    return (a + np.pi) % (2 * np.pi) - np.pi


def test_single_integrator_step():
    model = get_model(SINGLE_INTEGRATOR_2D)
    spec = make_spec(SINGLE_INTEGRATOR_2D)
    x = jnp.array([1.0, 2.0])
    u = jnp.array([0.3, -0.4])
    out = model.step(x, u, spec, DT)
    np.testing.assert_allclose(np.asarray(out), [1.015, 1.98], atol=1e-6)


def test_double_integrator_velocity_clamp():
    model = get_model(DOUBLE_INTEGRATOR_2D)
    spec = make_spec(DOUBLE_INTEGRATOR_2D, v_max=1.0)
    x = jnp.array([0.0, 0.0, 0.9, 0.5])  # |v| > 1 after accel
    u = jnp.array([1.0, 1.0])
    out = np.asarray(model.step(x, u, spec, DT))
    # reference: Euler then scale velocity to v_max (double_integrator2D.py:79-107)
    vx, vy = 0.9 + 0.05, 0.5 + 0.05
    vmag = np.hypot(vx, vy)
    scale = 1.0 / vmag
    np.testing.assert_allclose(out[2:], [vx * scale, vy * scale], atol=1e-6)
    np.testing.assert_allclose(out[:2], [0.045, 0.025], atol=1e-6)


def test_dynamic_unicycle_step_and_nominal():
    model = get_model(DYNAMIC_UNICYCLE_2D)
    spec = make_spec(DYNAMIC_UNICYCLE_2D)
    x = jnp.array([1.0, 1.0, np.pi / 4, 0.8])
    u = jnp.array([0.2, -0.1])
    out = np.asarray(model.step(x, u, spec, DT))
    exp = np.array(
        [
            1.0 + 0.8 * np.cos(np.pi / 4) * DT,
            1.0 + 0.8 * np.sin(np.pi / 4) * DT,
            norm_angle(np.pi / 4 - 0.1 * DT),
            0.8 + 0.2 * DT,
        ]
    )
    np.testing.assert_allclose(out, exp, rtol=1e-6)

    # nominal_input (dynamic_unicycle2D.py:80-104)
    goal = jnp.array([3.0, 1.0])
    un = np.asarray(model.nominal_input(x, goal, spec))
    dist = max(np.linalg.norm([2.0, 0.0]) - 0.05, 0.0)
    err = norm_angle(0.0 - np.pi / 4)
    v = min(1.0 * dist * np.cos(err), 1.0)
    np.testing.assert_allclose(un, [1.0 * (v - 0.8), 2.0 * err], rtol=1e-5)

    # 90-degree gate: facing away -> v = 0
    x_away = jnp.array([1.0, 1.0, np.pi, 0.5])
    un2 = np.asarray(model.nominal_input(x_away, goal, spec))
    np.testing.assert_allclose(un2[0], 1.0 * (0.0 - 0.5), rtol=1e-5)


def test_unicycle_nominal_min_distance_floor():
    model = get_model(UNICYCLE_2D)
    spec = make_spec(UNICYCLE_2D)
    x = jnp.array([0.0, 0.0, 0.0])
    goal = jnp.array([0.051, 0.0])  # distance-d_min below the 0.05 floor
    u = np.asarray(model.nominal_input(x, goal, spec))
    np.testing.assert_allclose(u[0], 0.05, atol=1e-6)  # unicycle2D.py:76


def test_kinematic_bicycle_clip_and_slip():
    model = get_model(KINEMATIC_BICYCLE_2D)
    spec = make_spec(KINEMATIC_BICYCLE_2D)
    # v clipped to [v_min, v_max] (kinematic_bicycle2D.py:112-123)
    x = jnp.array([0.0, 0.0, 0.0, 0.1])
    u = jnp.array([-5.0, 0.0])
    out = np.asarray(model.step(x, u, spec, DT))
    assert out[3] == pytest.approx(0.2)  # v_min

    # slip-angle map beta(delta) (:55-59)
    delta = 0.3
    beta = float(model.beta_from_delta(jnp.asarray(delta), spec))
    assert beta == pytest.approx(np.arctan(0.5 * np.tan(0.3)), rel=1e-6)
    assert float(model.delta_from_beta(jnp.asarray(beta), spec)) == pytest.approx(
        delta, rel=1e-6
    )


def test_all_models_jit_and_vmap():
    for name in [
        SINGLE_INTEGRATOR_2D,
        DOUBLE_INTEGRATOR_2D,
        UNICYCLE_2D,
        DYNAMIC_UNICYCLE_2D,
        KINEMATIC_BICYCLE_2D,
    ]:
        model = get_model(name)
        spec = make_spec(name)
        n, m = model.N_STATES, model.N_CONTROLS
        xs = jnp.ones((16, n)) * 0.5
        us = jnp.ones((16, m)) * 0.1
        step = jax.jit(jax.vmap(lambda x, u: model.step(x, u, spec, DT)))
        out = step(xs, us)
        assert out.shape == (16, n)
        assert np.isfinite(np.asarray(out)).all()
