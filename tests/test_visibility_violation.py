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


def test_arc_safety_area_flips_violation_for_turning_unicycle():
    """The decelerating-arc branch (robots/robot.py:704-741) must run in
    closed loop: a turning unicycle whose footprint covers only the straight
    corridor ahead violates via the ARC tube (it sweeps off-corridor), while
    the straight tube (yaw_rate=0) stays covered."""
    from safe_control_tpu.core.spec import UNICYCLE_2D

    from safe_control_tpu.core.spec import UNICYCLE_2D as UNI

    # Tiny camera so the per-step FoV update cannot re-cover the arc.
    spec = make_spec(
        UNI, radius=0.25, v_max=2.0, w_max=2.0, cam_range=0.5,
        fov_angle=math.radians(5.0),
    )
    gs = grid_mod.GridSpec(width=16.0, height=16.0, resolution=0.2)
    pos = jnp.asarray([4.0, 8.0])

    # Footprint = straight corridor along +x only (0.45 m half-width: covers
    # the radius-0.25 straight tube, nothing lateral).
    cx, cy = grid_mod.cell_centers(gs)
    footprint = (jnp.abs(cy - 8.0) <= 0.45) & (cx >= 2.0)

    straight = grid_mod.safety_area_mask(
        gs, pos, 0.0, 2.0, 0.0, spec, 0.05, max_decel=1.0, max_ang_decel=1.0
    )
    arc = grid_mod.safety_area_mask(
        gs, pos, 0.0, 2.0, 2.0, spec, 0.05, max_decel=1.0, max_ang_decel=1.0
    )
    beyond_straight = bool(
        grid_mod.is_beyond_footprint(footprint, gs, pos, safety_mask=straight)
    )
    beyond_arc = bool(
        grid_mod.is_beyond_footprint(footprint, gs, pos, safety_mask=arc)
    )
    assert not beyond_straight  # straight tube covered by the corridor
    assert beyond_arc  # the arc sweeps out of the corridor -> violation

    # Orchestrator integration: the tracker feeds the LIVE yaw rate (u[1]) to
    # the safety area, so a hard turn command (waypoint 45 deg off-heading,
    # nominal omega = 2*0.785 -> 1.57 rad/s) violates, while driving straight
    # at the dead-ahead waypoint stays covered.
    cfg = tracking.TrackerConfig(
        model_name=UNI, pos_controller="cbf_qp", dt=0.05,
        use_sensor=True, grid=gs, att_controller="none", max_decel=1.0,
        max_ang_decel=1.0,
    )
    known = pad_obstacles(jnp.zeros((0, 7)), 4)

    def one_ret(waypoint):
        wps = jnp.asarray([waypoint], dtype=jnp.float32)
        st = tracking.init_state(
            cfg, spec, jnp.array([4.0, 8.0, 0.0]), first_goal=np.array(waypoint)
        )
        st = st._replace(
            footprint=footprint, mode=jnp.asarray(tracking.TRACK, jnp.int32)
        )
        out = jax.jit(
            lambda s: tracking.step(cfg, spec, s, wps, jnp.asarray(1), known)
        )(st)
        return int(out.ret)

    assert one_ret([8.0, 12.0]) == tracking.RET_VISIBILITY  # turning
    assert one_ret([14.0, 8.0]) == tracking.RET_OK  # straight ahead


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
