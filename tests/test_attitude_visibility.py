"""Visibility yaw controllers + yaw gatekeeper + warehouse env tests."""

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_tpu.attitude import gatekeeper_att as gka
from safe_control_tpu.attitude.visibility import (
    visibility_area_yaw,
    visibility_raycast_yaw,
)
from safe_control_tpu.core.spec import DOUBLE_INTEGRATOR_2D, make_spec
from safe_control_tpu.envs.warehouse_env import WarehouseEnv
from safe_control_tpu.perception import grid as grid_mod

SPEC = make_spec(DOUBLE_INTEGRATOR_2D)
GS = grid_mod.GridSpec(width=10.0, height=10.0, resolution=0.1)


def _half_explored_footprint(pos):
    """Everything behind the robot (x < pos_x) is explored."""
    fp = grid_mod.empty_footprint(GS)
    cx, _ = grid_mod.cell_centers(GS)
    return fp | (cx < pos[0])


def test_visibility_area_turns_toward_unexplored():
    pos = jnp.array([5.0, 5.0])
    fp = _half_explored_footprint(pos)
    # facing the explored half (-x): the controller must command a turn
    w = float(visibility_area_yaw(fp, GS, pos, jnp.asarray(jnp.pi), SPEC))
    assert abs(w) > 0.1
    # facing the unexplored half (+x): near-zero command
    w2 = float(visibility_area_yaw(fp, GS, pos, jnp.asarray(0.0), SPEC))
    assert abs(w2) < abs(w)


def test_visibility_area_empty_map_rotates():
    fp = grid_mod.empty_footprint(GS)
    w = float(visibility_area_yaw(fp, GS, jnp.array([5.0, 5.0]), 0.0, SPEC))
    assert w == float(SPEC.w_max)


def test_visibility_raycast_prefers_unexplored():
    pos = jnp.array([5.0, 5.0])
    fp = _half_explored_footprint(pos)
    w = float(visibility_raycast_yaw(fp, GS, pos, jnp.asarray(jnp.pi), SPEC))
    assert abs(w) > 0.05


def test_gatekeeper_att_reacts_to_unknown_path():
    """Predicted path leaves the known map: the yaw command must turn the
    camera toward the critical point."""
    cfg = gka.GatekeeperAttConfig(horizon=20)
    st = gka.init_state(cfg)
    pos = jnp.array([5.0, 5.0])
    fp = grid_mod.init_footprint(GS, pos, SPEC)
    fp = grid_mod.update_footprint(fp, GS, pos, 0.0, SPEC)  # cone along +x
    # path curves up into unexplored area
    ks = jnp.arange(21, dtype=jnp.float32)
    pos_traj = jnp.stack([pos[0] + 0.1 * ks, pos[1] + 0.08 * ks], axis=1)
    vel_traj = jnp.tile(jnp.array([1.0, 0.8]), (21, 1))
    # camera facing away (-y): reactive fallback should command positive yaw
    u, st, info = gka.step(
        cfg, SPEC, st, fp, GS, pos_traj, vel_traj,
        yaw=jnp.asarray(-jnp.pi / 2), speed=jnp.asarray(1.0),
    )
    assert bool(info["crossing"])
    assert float(u) > 0.1  # turn toward the unknown region
    assert np.isfinite(float(u))


def test_gatekeeper_att_quiet_when_path_known():
    cfg = gka.GatekeeperAttConfig(horizon=20)
    st = gka.init_state(cfg)
    pos = jnp.array([5.0, 5.0])
    fp = jnp.ones((GS.nx, GS.ny), dtype=bool)  # everything known
    ks = jnp.arange(21, dtype=jnp.float32)
    pos_traj = jnp.stack([pos[0] + 0.1 * ks, jnp.full(21, 5.0)], axis=1)
    vel_traj = jnp.tile(jnp.array([1.0, 0.0]), (21, 1))
    u, st, info = gka.step(
        cfg, SPEC, st, fp, GS, pos_traj, vel_traj,
        yaw=jnp.asarray(0.0), speed=jnp.asarray(1.0),
    )
    assert not bool(info["crossing"])
    assert bool(info["found"])  # full nominal commitment


def test_warehouse_env():
    env = WarehouseEnv(level=2, dt=0.05)
    assert env.static_obstacles.shape == (16, 3)
    g = np.asarray(env.ghosts)
    assert (g[:, 4] > 0).sum() == 5  # level 2 has 5 ghosts
    # ghost bounce
    env._ghosts[0] = [99.9, 50.0, 4.0, 0.0, 2.0]
    env.step()
    assert env._ghosts[0][2] < 0  # bounced off right wall
    # collision queries
    assert bool(env.check_static_collision(jnp.array([20.0, 20.0]), 0.5))
    assert not bool(env.check_static_collision(jnp.array([10.0, 10.0]), 0.5))
    assert bool(env.check_boundary_collision(jnp.array([0.2, 50.0]), 0.5))
    assert bool(env.check_goal_reached(jnp.array([90.0, 90.0])))
    wps = env.get_nominal_waypoints()
    assert wps.shape == (9, 2)
