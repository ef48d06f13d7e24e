"""Golden parity anchors for the 5 BASELINE.json configs.

Criterion (BASELINE.md): max |u - u_ref| < 1e-3 vs the reference solver
under identical horizon/dt.  The goldens in tests/data/parity_goldens.npz
are float64 scipy-SLSQP solutions of the SAME problems with all barrier rows
built from independent NumPy implementations of the reference's formulas —
see tests/data/gen_parity_goldens.py for the generator and the
basin-consistency policy.

Every anchor runs THIS repo's f32 solver COLD (no warm start) at the stored
state and compares the applied control.  The MPC configs use the solver's
accuracy-mode iteration budget (same horizon/dt as the closed-loop default;
the AL outer/Newton budget is a solver knob, not part of the problem) —
matching what the generator's identifiability filter was run with.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_tpu.core.spec import (
    DOUBLE_INTEGRATOR_2D,
    DYNAMIC_UNICYCLE_2D,
    KINEMATIC_BICYCLE_2D_C3BF,
    KINEMATIC_BICYCLE_2D_DPCBF,
    make_spec,
)
from safe_control_tpu.core.types import pad_obstacles
from safe_control_tpu.solvers import cbf_qp, mpc_cbf

DT = 0.05
TOL = 1e-3

DATA = np.load(os.path.join(os.path.dirname(__file__), "data", "parity_goldens.npz"))


def _dev(ours, gold):
    return np.max(np.abs(np.asarray(ours, dtype=float) - gold))


def test_config1_di_cbf_qp_anchors():
    spec = make_spec(DOUBLE_INTEGRATOR_2D)
    obs = pad_obstacles(jnp.asarray(DATA["c1_obs"], jnp.float32), 5)
    worst = 0.0
    for x, uref, gold in zip(DATA["c1_x"], DATA["c1_uref"], DATA["c1_gold"]):
        r = cbf_qp.solve(
            DOUBLE_INTEGRATOR_2D, spec, jnp.asarray(x, jnp.float32),
            jnp.asarray(uref, jnp.float32), obs, DT,
        )
        worst = max(worst, _dev(r.u, gold))
    assert worst < TOL, f"config1 worst deviation {worst}"


ACCURACY_CFG = mpc_cbf.MPCConfig(horizon=8, num_obs=5,
                                 outer_iters=12, newton_iters=4)


def test_config2_du_mpc_cbf_anchors():
    spec = make_spec(DYNAMIC_UNICYCLE_2D, a_max=1.0, w_max=0.5)
    cfg = ACCURACY_CFG
    obs = pad_obstacles(jnp.asarray(DATA["c2_obs"], jnp.float32), 5)
    goal = jnp.asarray(DATA["c2_goal"], jnp.float32)
    worst = 0.0
    for x, uprev, gold in zip(DATA["c2_x"], DATA["c2_uprev"], DATA["c2_gold"]):
        st = mpc_cbf.init_state(DYNAMIC_UNICYCLE_2D, cfg)
        r = mpc_cbf.solve(
            DYNAMIC_UNICYCLE_2D, spec, jnp.asarray(x, jnp.float32), goal, obs,
            jnp.asarray(uprev, jnp.float32), st, DT, cfg,
        )
        worst = max(worst, _dev(r.u, gold))
    assert worst < TOL, f"config2 worst deviation {worst}"


def test_config3_du_mpc_unknown_env_anchors():
    spec = make_spec(DYNAMIC_UNICYCLE_2D, a_max=1.0, w_max=0.5)
    cfg = ACCURACY_CFG
    goal = jnp.asarray(DATA["c3_goal"], jnp.float32)
    worst = 0.0
    for x, uprev, obs_rows, gold in zip(
        DATA["c3_x"], DATA["c3_uprev"], DATA["c3_obs"], DATA["c3_gold"]
    ):
        st = mpc_cbf.init_state(DYNAMIC_UNICYCLE_2D, cfg)
        r = mpc_cbf.solve(
            DYNAMIC_UNICYCLE_2D, spec, jnp.asarray(x, jnp.float32), goal,
            jnp.asarray(obs_rows, jnp.float32),
            jnp.asarray(uprev, jnp.float32), st, DT, cfg,
        )
        worst = max(worst, _dev(r.u, gold))
    assert worst < TOL, f"config3 worst deviation {worst}"


@pytest.mark.parametrize(
    "tag,model_name",
    [("c4c", KINEMATIC_BICYCLE_2D_C3BF), ("c4d", KINEMATIC_BICYCLE_2D_DPCBF)],
)
def test_config4_kb_dynamic_obstacle_anchors(tag, model_name):
    spec = make_spec(model_name)
    worst = 0.0
    for x, obs_row, uref, gold in zip(
        DATA[f"{tag}_x"], DATA[f"{tag}_obs"], DATA[f"{tag}_uref"],
        DATA[f"{tag}_gold"],
    ):
        obs = pad_obstacles(jnp.asarray(obs_row[None], jnp.float32), 5)
        r = cbf_qp.solve(
            model_name, spec, jnp.asarray(x, jnp.float32),
            jnp.asarray(uref, jnp.float32), obs, DT,
        )
        worst = max(worst, _dev(r.u, gold))
    assert worst < TOL, f"{tag} worst deviation {worst}"


def test_config5_fleet_family_anchors():
    spec = make_spec(DYNAMIC_UNICYCLE_2D, a_max=1.0, w_max=0.8, v_max=0.7)
    obs = pad_obstacles(jnp.asarray(DATA["c5_obs"], jnp.float32), 8)
    worst = 0.0
    for x, uref, gold in zip(DATA["c5_x"], DATA["c5_uref"], DATA["c5_gold"]):
        r = cbf_qp.solve(
            DYNAMIC_UNICYCLE_2D, spec, jnp.asarray(x, jnp.float32),
            jnp.asarray(uref, jnp.float32), obs, DT,
        )
        worst = max(worst, _dev(r.u, gold))
    assert worst < TOL, f"config5 worst deviation {worst}"
