"""Full orchestrator/controller-factory dispatch through the reference API.

The reference's factory (tracking.py:140-181) selects among 4 position
controllers and 5 attitude controllers, plus the ``unknown_obs_detection``
axis (robots/robot.py:799-806).  These tests drive each branch through the
public ``LocalTrackingController`` wrapper or the functional tracker and
check the scenario-level contracts (goal progress, return codes, yaw
reaction) — making every built component reachable through the reference
API surface.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_tpu.core import spec as spec_mod
from safe_control_tpu.envs.env import Env
from safe_control_tpu.sim import tracking
from safe_control_tpu.sim.controller import LocalTrackingController


def _env():
    return Env(width=12.0, height=12.0, known_obs=[[6.0, 5.0, 0.5, 0, 0, 0, 0]],
               resolution=0.25)


def test_optimal_decay_cbf_qp_tracks_goal():
    # optimal_decay_cbf_qp dispatch (tracking.py:144-146): reaches the goal
    # past a blocking obstacle without ever reporting infeasible.
    c = LocalTrackingController(
        [1.0, 1.0, 0.0, 0.5], {"model": "DynamicUnicycle2D"},
        controller_type={"pos": "optimal_decay_cbf_qp"}, dt=0.05, env=_env(),
    )
    c.set_waypoints([[9.0, 6.0]])
    rets = []
    for _ in range(500):
        rets.append(c.control_step())
        if rets[-1] == tracking.RET_DONE:
            break
    assert tracking.RET_INFEASIBLE not in rets
    assert tracking.RET_DONE in rets, np.asarray(c.robot_state)


@pytest.mark.slow
def test_optimal_decay_mpc_cbf_tracks_goal():
    # optimal_decay_mpc_cbf dispatch (tracking.py:147-150).
    c = LocalTrackingController(
        [1.0, 1.0, 0.0, 0.5], {"model": "DynamicUnicycle2D"},
        controller_type={"pos": "optimal_decay_mpc_cbf"}, dt=0.05, env=_env(),
    )
    assert c.cfg.mpc.optimal_decay
    c.set_waypoints([[9.0, 6.0]])
    rets = []
    for _ in range(500):
        rets.append(c.control_step())
        if rets[-1] == tracking.RET_DONE:
            break
    assert tracking.RET_INFEASIBLE not in rets
    assert tracking.RET_DONE in rets, np.asarray(c.robot_state)


def test_unknown_pos_controller_rejected():
    with pytest.raises(ValueError, match="Unknown controller type"):
        tracking.TrackerConfig(model_name="DynamicUnicycle2D",
                               pos_controller="nope")
    with pytest.raises(ValueError, match="Unknown attitude controller"):
        tracking.TrackerConfig(model_name="DoubleIntegrator2D",
                               att_controller="nope")
    with pytest.raises(ValueError, match="Unsupported unknown_obs_detection"):
        tracking.TrackerConfig(model_name="DoubleIntegrator2D",
                               detection_mode="lidar")


@pytest.mark.parametrize("att", ["simple", "visibility_area", "visibility_raycast"])
def test_attitude_dispatch_rotates_camera(att):
    # Attitude factory branches (tracking.py:156-172).  Each controller must
    # actually steer the yaw side-channel while the robot tracks.
    c = LocalTrackingController(
        [1.0, 1.0, 0.0, 0.0],
        {"model": "DoubleIntegrator2D", "sensor": "rgbd"},
        controller_type={"pos": "cbf_qp", "att": att}, dt=0.05, env=_env(),
        enable_rotation=True,
    )
    c.set_waypoints([[9.0, 9.0]])
    yaws = []
    for _ in range(120):
        c.control_step()
        yaws.append(float(c.state.yaw))
    assert np.ptp(yaws) > 0.05, f"{att} never moved the camera"
    # visibility controllers must have expanded the footprint
    assert bool(np.asarray(c.state.footprint).any())


@pytest.mark.slow
def test_gatekeeper_attitude_with_mpc_prediction():
    # GatekeeperAtt wired to the positional MPC prediction
    # (gatekeeper_attitude.py:159-241 + tracking.py:173-176).
    c = LocalTrackingController(
        [1.0, 1.0, 0.0, 0.0],
        {"model": "DoubleIntegrator2D", "sensor": "rgbd"},
        controller_type={"pos": "mpc_cbf", "att": "gatekeeper"},
        dt=0.05, env=_env(), enable_rotation=True,
    )
    c.set_waypoints([[9.0, 9.0]])
    for _ in range(60):
        ret = c.control_step()
        assert ret != tracking.RET_INFEASIBLE
    st = c.state.att_gk
    # the gatekeeper actually ran events and committed something
    assert int(st.total_replans) > 0
    assert bool(st.initialized)


def test_ray_detection_mode_through_wrapper():
    # unknown_obs_detection='ray' (robots/robot.py:799-806,
    # utils/detection.py:90-132): the obstacle becomes visible through the
    # accumulated footprint and feeds the controller (no persistent memory).
    c = LocalTrackingController(
        [1.0, 4.0, 0.0, 0.0],
        {"model": "DoubleIntegrator2D", "sensor": "rgbd",
         "unknown_obs_detection": "ray"},
        controller_type={"pos": "cbf_qp"}, dt=0.05, env=_env(),
        enable_rotation=True,
    )
    assert c.cfg.detection_mode == "ray"
    # Obstacle slightly off the straight-line path (a dead-center obstacle
    # deadlocks any symmetric safety filter, reference included).
    c.set_unknown_obs([[5.0, 3.4, 0.5, 0, 0, 0, 0]])
    c.set_waypoints([[10.0, 4.0]])
    rets = []
    for _ in range(500):
        ret = c.control_step()
        rets.append(ret)
        if ret == tracking.RET_DONE:
            break
    assert tracking.RET_INFEASIBLE not in rets  # never hit the obstacle
    assert ret == tracking.RET_DONE, np.asarray(c.robot_state)
    # ray mode actually detected something through the footprint
    assert not bool(np.asarray(c.state.mem.valid).any())  # no fov memory used


def test_visibility_violation_reachable_through_wrapper():
    # Return code 1 must fire through the public wrapper when the robot
    # outruns its sensing footprint (tracking.py:652-668): a fast integrator
    # with a tiny camera range violates the safety-area coverage.
    c = LocalTrackingController(
        [1.0, 6.0, 0.0, 0.0],
        {"model": "DoubleIntegrator2D", "sensor": "rgbd", "cam_range": 0.6,
         "fov_angle": 40.0, "v_max": 3.0, "a_max": 3.0},
        controller_type={"pos": "cbf_qp"}, dt=0.05, env=_env(),
        enable_rotation=False,
    )
    assert c.cfg.grid is not None  # wrapper auto-built the GridSpec from env
    c.set_waypoints([[11.0, 6.0]])
    rets = [c.control_step() for _ in range(200)]
    assert tracking.RET_VISIBILITY in rets


@pytest.mark.slow
def test_vtol_collision_oracle_ground_and_pitch():
    # VTOL ground-strike / pitch terms (tracking.py:488-495) fire through the
    # orchestrator's collision oracle, not hand-checks in the example.
    # horizon 4: the collision oracle under test is horizon-independent,
    # and the default N=10 VTOL MPC dominated this test's runtime (~145 s)
    from safe_control_tpu.solvers import mpc_cbf as mpc_mod

    cfg = tracking.TrackerConfig(model_name="VTOL2D", pos_controller="mpc_cbf",
                                 att_controller="none", dt=0.05,
                                 vtol_pitch_oracle="strict",
                                 mpc=mpc_mod.MPCConfig(horizon=4, num_obs=5))
    spec = spec_mod.make_spec("VTOL2D")
    wps = jnp.asarray([[50.0, 10.0]], dtype=jnp.float32)
    known = jnp.tile(jnp.asarray([1e3, 1e3, 0, 0, 0, 0, 0], jnp.float32), (4, 1))

    step_jit = jax.jit(
        lambda st: tracking.step(cfg, spec, st, wps, jnp.asarray(1), known)
    )

    def one_ret(x0):
        st = tracking.init_state(cfg, spec, x0, first_goal=wps[0])
        return int(step_jit(st).ret)

    # below ground -> -2
    assert one_ret(jnp.asarray([5.0, -0.1, 0, 5.0, 0, 0], jnp.float32)) == -2
    # pitch beyond the limit -> -2
    bad_pitch = math.radians(float(spec.pitch_max)) + 0.2
    assert one_ret(jnp.asarray([5.0, 10.0, bad_pitch, 5.0, 0, 0], jnp.float32)) == -2
    # healthy cruise -> not -2
    assert one_ret(jnp.asarray([5.0, 10.0, 0.0, 5.0, 0, 0], jnp.float32)) != -2
