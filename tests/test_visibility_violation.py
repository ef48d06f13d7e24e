"""Visibility-violation return code (tracking.py:652-668 contract)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_tpu.core.spec import DOUBLE_INTEGRATOR_2D, make_spec
from safe_control_tpu.core.types import pad_obstacles
from safe_control_tpu.perception import grid as grid_mod
from safe_control_tpu.sim import tracking


def test_visibility_violation_flagged_and_nonterminal():
    """A DI robot commanded to fly backward (away from where the camera has
    looked) must produce ret=1 at some steps, and the run must CONTINUE
    (code 1 is accumulated, not terminal)."""
    spec = make_spec(
        DOUBLE_INTEGRATOR_2D, v_max=1.0, a_max=1.5, radius=0.25,
        cam_range=2.0, fov_angle=math.radians(70.0),
    )
    gs = grid_mod.GridSpec(width=16.0, height=16.0, resolution=0.2)
    cfg = tracking.TrackerConfig(
        model_name=DOUBLE_INTEGRATOR_2D, pos_controller="cbf_qp", dt=0.05,
        use_sensor=True, grid=gs, att_controller="none",
    )
    known = pad_obstacles(jnp.zeros((0, 7)), 4)
    # Waypoint behind the initial camera direction: the yaw side-channel is
    # frozen (att 'none'), so the robot drives into unexplored space.
    wps = jnp.asarray([[2.0, 8.0], [14.0, 8.0]], dtype=jnp.float32)
    st = tracking.init_state(
        cfg, spec, jnp.array([8.0, 8.0, 0.0, 0.0]), yaw0=jnp.pi,
        first_goal=np.array([2.0, 8.0]),
    )
    run = jax.jit(
        lambda st: tracking.run(cfg, spec, st, wps, jnp.asarray(2), known, 500)
    )
    final, traj = run(st)
    rets = np.asarray(traj["ret"])
    # camera faces -x; first waypoint at -x is visible, second at +x is not:
    # the robot must at some point drive with its safety tube outside the map
    assert np.any(rets == tracking.RET_VISIBILITY), rets[:50]
    # and the run continued past the first violation
    first_viol = int(np.argmax(rets == tracking.RET_VISIBILITY))
    assert np.any(rets[first_viol + 1 :] != tracking.RET_INFEASIBLE)
    xs = np.asarray(traj["x"])
    assert xs[-1, 0] > 8.0  # robot kept moving toward the +x waypoint


def test_no_violation_when_camera_leads():
    """With velocity-tracking yaw the camera turns into the motion direction:
    far fewer (ideally zero) violations on the same path."""
    spec = make_spec(
        DOUBLE_INTEGRATOR_2D, v_max=1.0, a_max=1.5, radius=0.25,
        cam_range=3.0, fov_angle=math.radians(70.0),
    )
    gs = grid_mod.GridSpec(width=16.0, height=16.0, resolution=0.2)
    cfg = tracking.TrackerConfig(
        model_name=DOUBLE_INTEGRATOR_2D, pos_controller="cbf_qp", dt=0.05,
        use_sensor=True, grid=gs,
    )
    known = pad_obstacles(jnp.zeros((0, 7)), 4)
    wps = jnp.asarray([[14.0, 8.0]], dtype=jnp.float32)
    st = tracking.init_state(
        cfg, spec, jnp.array([2.0, 8.0, 0.0, 0.0]), yaw0=0.0,
        first_goal=np.array([14.0, 8.0]),
    )
    run = jax.jit(
        lambda st: tracking.run(cfg, spec, st, wps, jnp.asarray(1), known, 400)
    )
    final, traj = run(st)
    rets = np.asarray(traj["ret"])
    viol_frac = (rets == tracking.RET_VISIBILITY).mean()
    assert viol_frac < 0.05, f"violations {viol_frac}"
    assert final.ret == tracking.RET_DONE
