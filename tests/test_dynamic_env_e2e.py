"""Dynamic-environment end-to-end scenario (dynamic_env/main.py analog).

KinematicBicycle2D_DPCBF threading 8 bouncing dynamic obstacles
(dynamic_env/main.py:238-366): success = final waypoint reached with no
collision.  Also exercises run_dynamic / step_dynamic_obstacles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_tpu.core.spec import (
    KINEMATIC_BICYCLE_2D_C3BF,
    KINEMATIC_BICYCLE_2D_DPCBF,
    make_spec,
)
from safe_control_tpu.core.types import pad_obstacles
from safe_control_tpu.sim import tracking

# dynamic_env/main.py:247-267
BASE_OBS = np.array(
    [
        [8.0, 9.0, 0.5],
        [10.0, 4.0, 0.5],
        [12.0, 5.0, 0.5],
        [14.0, 9.0, 0.5],
        [16.0, 6.0, 0.5],
        [18.0, 14.0, 0.5],
        [20.0, 4.0, 0.5],
        [22.0, 12.0, 0.5],
    ]
)
VELS = np.array(
    [[-0.5, 0.5] if i % 2 == 0 else [-0.5, -0.5] for i in range(len(BASE_OBS))]
)
WAYPOINTS = np.array([[1.0, 7.5, 0.0], [20.0, 7.5, 0.0]])


def _moving_obs():
    rows = np.hstack([BASE_OBS, VELS, np.zeros((len(BASE_OBS), 2))])
    return pad_obstacles(jnp.asarray(rows), 8)


@pytest.mark.parametrize(
    "model_name", [KINEMATIC_BICYCLE_2D_DPCBF, KINEMATIC_BICYCLE_2D_C3BF]
)
def test_dynamic_obstacle_scenario(model_name):
    spec = make_spec(model_name, a_max=5.0, radius=0.3)
    cfg = tracking.TrackerConfig(
        model_name=model_name, pos_controller="cbf_qp", dt=0.05, num_obs=8
    )
    x0 = jnp.array([1.0, 7.5, 0.0, 1.0])
    st = tracking.init_state(cfg, spec, x0, 0.0, first_goal=WAYPOINTS[0][:2])
    wps = jnp.asarray(WAYPOINTS[:, :2], dtype=jnp.float32)

    run = jax.jit(
        lambda st, obs: tracking.run_dynamic(
            cfg, spec, st, wps, jnp.asarray(2), obs, n_steps=800,
            y_range=(0.0, 15.0),
        )
    )
    final, obs_final, traj = run(st, _moving_obs())
    rets = np.asarray(traj["ret"])
    assert not np.any(rets == tracking.RET_INFEASIBLE), "collision/infeasible"
    assert final.ret == tracking.RET_DONE, (
        f"did not finish: ret={int(final.ret)} x={np.asarray(final.x)}"
    )


def test_step_dynamic_obstacles_bounce():
    obs = pad_obstacles(
        jnp.asarray([[1.0, 14.9, 0.5, 0.0, 1.0, 0, 0]]), 2
    )
    out = tracking.step_dynamic_obstacles(obs, 0.2, y_range=(0.0, 15.0))
    # crossed y_max -> vy flipped
    assert float(out[0, 4]) == -1.0
    np.testing.assert_allclose(float(out[0, 1]), 15.1, atol=1e-6)
