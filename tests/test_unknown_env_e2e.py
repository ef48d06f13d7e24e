"""Unknown-environment end-to-end scenario (examples/test_unknown_env.py).

The robot only learns about the 'unknown' obstacles through FoV detection
with persistent memory; success = all waypoints reached, no collision —
the reference predicate (:330-335).  Uses the DoubleIntegrator2D CBF-QP
variant of the indoor scenario (the reference's --model di --algo cbf_qp
axis), scaled to a CI-friendly horizon.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_tpu.core.spec import DOUBLE_INTEGRATOR_2D, make_spec
from safe_control_tpu.core.types import pad_obstacles
from safe_control_tpu.sim import tracking

# build_indoor_env (test_unknown_env.py:7-96)
WAYPOINTS = np.array(
    [
        [2.0, 2.0, math.pi / 2],
        [2.0, 15.0, 0.0],
        [9.4, 15.0, -math.pi / 2],
        [9.4, 5.0, 0.0],
        [16.6, 5.0, math.pi / 2],
        [16.6, 13.0, 0.0],
    ]
)
E_WALL = 6.0
KNOWN_OBS = np.vstack(
    [
        np.hstack([np.array([[4.0, 4.0, 0.60], [8.0, 3.0, 0.55], [14.5, 14.8, 0.75]]),
                   np.zeros((3, 4))]),
        np.array(
            [
                [6.0, 8.0, 0.22, 6.0, E_WALL, 0.0, 1.0],
                [7.4, 11.0, 1.4, 0.18, E_WALL, 0.0, 1.0],
                [12.8, 11.0, 1.4, 0.18, E_WALL, 0.0, 1.0],
                [13.0, 11.0, 0.18, 5.5, E_WALL, 0.0, 1.0],
                [4.3, 11.2, 0.90, 0.50, 6.0, np.pi / 10, 1.0],
            ]
        ),
    ]
)
UNKNOWN_OBS = np.array(
    [
        [2.45, 4.3, 0.19], [1.60, 7.0, 0.19], [2.40, 10.2, 0.19],
        [1.65, 13.1, 0.19], [3.5, 14.6, 0.19], [6.0, 15.35, 0.19],
        [8.3, 14.6, 0.19], [8.95, 13.3, 0.19], [9.85, 10.8, 0.19],
        [8.95, 8.0, 0.19], [9.85, 6.0, 0.19], [10.9, 5.45, 0.19],
        [13.0, 4.55, 0.19], [15.1, 5.45, 0.19], [16.15, 6.8, 0.19],
    ]
)

SPEC = make_spec(
    DOUBLE_INTEGRATOR_2D, v_max=1.5, a_max=1.8, radius=0.23,
    fov_angle=math.radians(70.0), cam_range=4.5,
    nominal_k_v=1.8, nominal_k_a=2.0, reached_threshold=0.45,
)


def test_unknown_env_di_cbf_qp():
    cfg = tracking.TrackerConfig(
        model_name=DOUBLE_INTEGRATOR_2D, pos_controller="cbf_qp", dt=0.05,
        num_obs=10, use_sensor=True, mem_slots=24,
        reached_threshold=0.45,
    )
    known = pad_obstacles(jnp.asarray(KNOWN_OBS), 12)
    unknown = pad_obstacles(jnp.asarray(UNKNOWN_OBS), 16)
    wps = jnp.asarray(WAYPOINTS[:, :2], dtype=jnp.float32)
    st = tracking.init_state(
        cfg, SPEC, jnp.array([2.0, 2.0, 0.0, 0.0]), math.pi / 2,
        first_goal=WAYPOINTS[0][:2],
    )

    run = jax.jit(
        lambda st: tracking.run(
            cfg, SPEC, st, wps, jnp.asarray(len(WAYPOINTS)), known,
            n_steps=int(120.0 / cfg.dt), unknown_obs=unknown,
        )
    )
    final, traj = run(st)
    rets = np.asarray(traj["ret"])
    assert not np.any(rets == tracking.RET_INFEASIBLE), "collision/infeasible"
    assert final.ret == tracking.RET_DONE, (
        f"ret {int(final.ret)} x {np.asarray(final.x)} gi {int(final.goal_idx)}"
    )
    # The persistent memory must have accumulated detections.
    assert int(final.mem.valid.sum()) >= 5
    # No unknown obstacle was ever touched.
    xs = np.asarray(traj["x"])[:, :2]
    for ob in UNKNOWN_OBS:
        d = np.linalg.norm(xs - ob[:2], axis=1).min()
        assert d > ob[2] + float(SPEC.radius) - 1e-3, f"hit unknown obs {ob}"


def test_detection_requires_line_of_sight_range():
    """An unknown obstacle behind the camera range is not in memory until
    approached (the detection gating actually gates)."""
    cfg = tracking.TrackerConfig(
        model_name=DOUBLE_INTEGRATOR_2D, pos_controller="cbf_qp", dt=0.05,
        num_obs=10, use_sensor=True, mem_slots=8,
    )
    far_unknown = pad_obstacles(jnp.asarray([[20.0, 2.0, 0.3, 0, 0, 0, 0]]), 4)
    known = pad_obstacles(jnp.zeros((0, 7)), 4)
    wps = jnp.asarray([[2.0, 2.0], [3.0, 2.0]], dtype=jnp.float32)
    st = tracking.init_state(cfg, SPEC, jnp.array([2.0, 2.0, 0.0, 0.0]), 0.0,
                             first_goal=np.array([2.0, 2.0]))
    out = tracking.step(cfg, SPEC, st, wps, jnp.asarray(2), known, far_unknown)
    assert int(out.state.mem.valid.sum()) == 0  # 18 m away, cam_range 4.5
