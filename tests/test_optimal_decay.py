"""Optimal-decay CBF-QP / MPC-CBF tests: pointwise feasibility via decay
relaxation (optimal_decay_cbf_qp.py, optimal_decay_mpc_cbf.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_tpu.core.spec import DYNAMIC_UNICYCLE_2D, make_spec
from safe_control_tpu.core.types import pad_obstacles
from safe_control_tpu.solvers import cbf_qp, mpc_cbf, optimal_decay_cbf_qp as od

DT = 0.05
SPEC = make_spec(DYNAMIC_UNICYCLE_2D, a_max=1.0, w_max=0.5)


def test_od_qp_matches_plain_when_slack():
    """Far from obstacles the decay variables stay ~1 and u ~ u_ref."""
    obs = jnp.array([50.0, 50.0, 0.3, 0, 0, 0, 0])
    x = jnp.array([0.0, 0.0, 0.0, 0.5])
    u_ref = jnp.array([0.3, 0.1])
    res = od.solve(DYNAMIC_UNICYCLE_2D, SPEC, x, u_ref, obs, DT)
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(u_ref), atol=1e-3)
    assert abs(float(res.omega1) - 1.0) < 1e-2
    assert abs(float(res.omega2) - 1.0) < 1e-2


def test_od_qp_feasible_where_plain_infeasible():
    """The scenario from test_infeasible_reports_status: the plain CBF-QP
    (alpha=1.5) is infeasible; the optimal-decay variant (its own
    alpha=0.5 table + omega relaxation, optimal_decay_cbf_qp.py:14-24)
    must stay feasible.  With DU's drift term 2v^2 dominating, omega stays
    ~1 and the filter just caps the acceleration at the analytic bound
    a* = (b_f + (a1+a2) hdot + a1 a2 h) / (2 d)."""
    obs_row = jnp.array([2.0, 0.0, 0.5, 0, 0, 0, 0])
    x = jnp.array([1.0, 0.0, 0.0, 1.0])
    u_ref = jnp.array([0.5, 0.0])
    plain = cbf_qp.solve(
        DYNAMIC_UNICYCLE_2D, SPEC, x, u_ref, pad_obstacles(obs_row[None], 10), DT
    )
    assert not bool(plain.feasible)
    res = od.solve(DYNAMIC_UNICYCLE_2D, SPEC, x, u_ref, obs_row, DT)
    assert bool(res.feasible)
    d, v = 1.0, 1.0
    h = d**2 - 1.01 * 0.75**2
    hdot = -2.0 * d * v
    b_f = 2.0 * v**2
    a_star = (b_f + 1.0 * hdot + 0.25 * h) / (2.0 * d)
    np.testing.assert_allclose(float(res.u[0]), a_star, atol=2e-3)
    # omega pinned to ~1 by the KKT trade-off (p_sb = 1e4)
    assert abs(float(res.omega1) - 1.0) < 1e-2
    assert abs(float(res.omega2) - 1.0) < 1e-2


@pytest.mark.slow
def test_od_mpc_feasible_in_tight_scene():
    obs = pad_obstacles(jnp.asarray([[1.2, 0.0, 0.5, 0, 0, 0, 0]]), 5)
    x0 = jnp.array([0.0, 0.0, 0.0, 1.0])
    goal = jnp.array([4.0, 0.0, 0.0, 0.0])
    up = jnp.zeros(2)

    cfg_plain = mpc_cbf.MPCConfig(horizon=8, num_obs=5)
    r_plain = jax.jit(lambda: mpc_cbf.solve(
        DYNAMIC_UNICYCLE_2D, SPEC, x0, goal, obs, up,
        mpc_cbf.init_state(DYNAMIC_UNICYCLE_2D, cfg_plain), DT, cfg_plain,
    ))()
    assert float(r_plain.viol) > 0.1  # genuinely infeasible

    cfg_od = mpc_cbf.MPCConfig(horizon=8, num_obs=5, optimal_decay=True)
    r_od = jax.jit(lambda: mpc_cbf.solve(
        DYNAMIC_UNICYCLE_2D, SPEC, x0, goal, obs, up,
        mpc_cbf.init_state(DYNAMIC_UNICYCLE_2D, cfg_od), DT, cfg_od,
    ))()
    assert bool(r_od.feasible)
    assert float(r_od.viol) < 1e-3
    # omegas relaxed above 1 to soften the constraint
    omegas = np.asarray(r_od.state.U[:, 2:])
    assert omegas.max() > 1.05
    # both brake at full authority
    assert float(r_od.u[0]) == -1.0
