"""Visibility yaw controllers + yaw gatekeeper + warehouse env tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


@pytest.mark.slow
def test_gatekeeper_att_reacts_to_unknown_path():
    """Predicted path leaves the known map while the camera faces away: the
    reactive fallback (gatekeeper_attitude.py:520-546) must fire and the yaw
    command turn toward the motion/critical direction."""
    cfg = gka.GatekeeperAttConfig(dt=0.05, nominal_horizon=0.5, backup_horizon=0.5)
    st = gka.init_state(cfg)
    T = cfg.total_steps
    pos = jnp.array([5.0, 5.0])
    fp = grid_mod.init_footprint(GS, pos, SPEC)
    fp = grid_mod.update_footprint(fp, GS, pos, 0.0, SPEC)  # cone along +x
    # path curves up into unexplored area
    ks = jnp.arange(T + 1, dtype=jnp.float32)
    pos_traj = jnp.stack([pos[0] + 0.1 * ks, pos[1] + 0.08 * ks], axis=1)
    vel_traj = jnp.tile(jnp.array([1.0, 0.8]), (T + 1, 1))
    # camera facing away (-y): reactive fallback should command positive yaw
    u, st, info = gka.step(
        cfg, SPEC, DOUBLE_INTEGRATOR_2D, st, fp, GS, pos_traj, vel_traj,
        yaw=jnp.asarray(-jnp.pi / 2),
    )
    assert bool(info["crossing"])
    assert bool(info["reactive"])
    assert float(u) > 0.1  # turn toward the unknown region
    assert np.isfinite(float(u))


def test_gatekeeper_att_quiet_when_path_known():
    cfg = gka.GatekeeperAttConfig(dt=0.05, nominal_horizon=0.5, backup_horizon=0.5)
    st = gka.init_state(cfg)
    T = cfg.total_steps
    pos = jnp.array([5.0, 5.0])
    fp = jnp.ones((GS.nx, GS.ny), dtype=bool)  # everything known
    ks = jnp.arange(T + 1, dtype=jnp.float32)
    pos_traj = jnp.stack([pos[0] + 0.1 * ks, jnp.full(T + 1, 5.0)], axis=1)
    vel_traj = jnp.tile(jnp.array([1.0, 0.0]), (T + 1, 1))
    u, st, info = gka.step(
        cfg, SPEC, DOUBLE_INTEGRATOR_2D, st, fp, GS, pos_traj, vel_traj,
        yaw=jnp.asarray(0.0),
    )
    assert not bool(info["crossing"])
    assert bool(info["found"])  # full nominal commitment
    assert int(info["nominal_len"]) == cfg.nominal_steps


@pytest.mark.slow
def test_gatekeeper_att_commits_longest_valid_prefix():
    """Map-edge scenario reproducing the reference's commit semantics
    (gatekeeper_attitude.py:556-598): the crossing step CAPS the nominal
    horizon at crossing_step - backup_steps, and the longest candidate that
    passes validation is committed; the committed segment then replays
    open-loop until the next event."""
    cfg = gka.GatekeeperAttConfig(
        dt=0.05, nominal_horizon=1.0, backup_horizon=0.5, event_offset=0.5,
        horizon_discount=0.25,
    )
    st = gka.init_state(cfg)
    T = cfg.total_steps  # 20 + 10
    pos = jnp.array([2.0, 5.0])
    # Known region: x < 4.0 (map edge ahead of the straight +x path).
    cx, _ = grid_mod.cell_centers(GS)
    fp = cx < 4.0
    ks = jnp.arange(T + 1, dtype=jnp.float32)
    pos_traj = jnp.stack([pos[0] + 0.1 * ks, jnp.full(T + 1, 5.0)], axis=1)
    vel_traj = jnp.tile(jnp.array([2.0, 0.0]), (T + 1, 1))
    # Camera already facing the path (+x): the critical point is visible, so
    # no reactive fallback; the event must commit a capped nominal prefix.
    u, st1, info = gka.step(
        cfg, SPEC, DOUBLE_INTEGRATOR_2D, st, fp, GS, pos_traj, vel_traj,
        yaw=jnp.asarray(0.0),
    )
    assert bool(info["crossing"]) and not bool(info["reactive"])
    crossing = int(info["crossing_step"])  # first cell with x >= 4.0 -> k=20
    assert crossing == 20
    cap = max(crossing - cfg.backup_steps, 0)  # latest admissible switch
    assert bool(info["found"])
    assert int(info["nominal_len"]) <= cap
    # longest valid = the cap itself here (cp stays visible straight ahead)
    assert int(info["nominal_len"]) == cap
    assert int(st1.committed_len) == min(int(info["nominal_len"]) + cfg.backup_steps, T)
    # Subsequent steps replay the committed segment (no event until offset).
    u2, st2, info2 = gka.step(
        cfg, SPEC, DOUBLE_INTEGRATOR_2D, st1, fp, GS, pos_traj, vel_traj,
        yaw=jnp.asarray(0.0),
    )
    assert not bool(info2["event"])
    assert int(st2.time_idx) == int(st1.time_idx) + 1
    np.testing.assert_allclose(
        np.asarray(st2.committed_u), np.asarray(st1.committed_u)
    )


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
