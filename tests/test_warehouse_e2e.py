"""Warehouse BackupCBF e2e: zig-zag traversal under ghost traffic.

The reference's warehouse case study pairs WarehouseEnv with the BackupCBF
h_safety building blocks (backup_cbf_qp.py:390-446: boundary halfspaces +
static obstacle distances + moving-obstacle distance at predicted time).
Here a DoubleIntegrator2D robot follows the nominal zig-zag waypoints
(warehouse_env.py:333-343) with the BackupCBF filter shielding against the
level-1 ghosts; pass = goal reached with no collision.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_tpu.core.spec import DOUBLE_INTEGRATOR_2D, make_spec
from safe_control_tpu.dynamics import get_model
from safe_control_tpu.envs.warehouse_env import WarehouseEnv
from safe_control_tpu.shielding import backup_cbf as bcbf

DT = 0.1
SPEC = make_spec(DOUBLE_INTEGRATOR_2D, v_max=3.0, a_max=3.0, ax_max=3.0,
                 ay_max=3.0, radius=0.8)
MODEL = get_model(DOUBLE_INTEGRATOR_2D)


_CTRL_CACHE = {}
MAX_SPOTS = 1024  # fixed shape: one compile serves every level


def _make_ctrl(env):
    """Jitted BackupCBF control step; one compile serves every level (the
    ghost table is fixed-shape (MAX_GHOSTS, 5) at all levels, and the
    safe-spot table is padded to MAX_SPOTS).

    Backup policy: evade to the nearest ghost-path-free parking spot
    (env.safe_spots — the warehouse analog of the reference's
    EvadeBackupController pocket, backup_controller.py:420-626).  Plain
    braking is NOT an invariant set here: corridor sweepers run over a
    parked robot, which is why the stop-backup variant loses every level
    above 1.
    """
    if "ctrl" in _CTRL_CACHE:
        return _CTRL_CACHE["ctrl"]
    radius = float(SPEC.radius)
    static = jnp.asarray(env.static_obstacles, jnp.float32)

    def backup_policy_at(spots):
        def backup_policy(x):
            p, v = x[:2], x[2:4]
            d = jnp.linalg.norm(spots - p[None, :], axis=1)
            tgt = spots[jnp.argmin(d)]
            a = 1.0 * (tgt - p) - 2.0 * v
            mag = jnp.linalg.norm(a)
            return a * jnp.where(mag > 3.0, 3.0 / jnp.maximum(mag, 1e-9), 1.0)

        return backup_policy

    def h_safety_at(ghosts0):
        def h_safety(x, t):
            p = x[:2]
            h_bnd = jnp.min(jnp.array([
                p[0] - radius, env.width - p[0] - radius,
                p[1] - radius, env.height - p[1] - radius,
            ]))
            d_s = jnp.sqrt((p[0] - static[:, 0]) ** 2 + (p[1] - static[:, 1]) ** 2)
            h_static = jnp.min(d_s - radius - static[:, 2])
            gx = ghosts0[:, 0] + ghosts0[:, 2] * t
            gy = ghosts0[:, 1] + ghosts0[:, 3] * t
            d_g = jnp.sqrt((p[0] - gx) ** 2 + (p[1] - gy) ** 2)
            h_ghost = jnp.min(
                jnp.where(ghosts0[:, 4] > 0, d_g - radius - ghosts0[:, 4], jnp.inf)
            )
            return jnp.minimum(jnp.minimum(h_bnd, h_static), h_ghost)

        return h_safety

    cfg = bcbf.BackupCBFConfig(
        model_name=DOUBLE_INTEGRATOR_2D, dt=DT, backup_steps=80, alpha=1.5,
    )

    @jax.jit
    def ctrl(x, goal, ghosts0, spots):
        u_ref = MODEL.nominal_input(x, goal, SPEC)
        h_s = h_safety_at(ghosts0)

        def h_t(xx):
            # terminal set: parked at a ghost-path-free spot
            d = jnp.min(jnp.linalg.norm(spots - xx[:2][None, :], axis=1))
            return jnp.minimum(1.0 - d, 1.0 - jnp.linalg.norm(xx[2:4]) / 0.5)

        return bcbf.solve(
            cfg, SPEC, x, u_ref, backup_policy_at(spots), h_s, h_t
        )

    _CTRL_CACHE["ctrl"] = ctrl
    return ctrl


def _padded_spots(env):
    sp = env.safe_spots(robot_radius=float(SPEC.radius))
    assert len(sp), "no safe spots at this level"
    pad = np.tile(sp[-1:], (MAX_SPOTS - len(sp), 1))
    return jnp.asarray(np.vstack([sp, pad])[:MAX_SPOTS], jnp.float32)


def run_warehouse_level(level, max_steps=1200):
    """Drive the zig-zag route at a ghost level; report the outcome.

    Returns dict(outcome='reached'|'collision'|'stalled', min_h=float,
    steps=int, min_rollout_h=float).
    """
    env = WarehouseEnv(level=level, dt=DT)
    wps = env.get_nominal_waypoints()
    radius = float(SPEC.radius)
    ctrl = _make_ctrl(env)
    spots = _padded_spots(env)

    x = jnp.asarray([10.0, 10.0, 0.0, 0.0], jnp.float32)
    wp_i = 1  # waypoint 0 is the start
    min_h = np.inf
    min_rollout_h = np.inf
    for k in range(max_steps):
        ghosts0 = env.ghosts
        goal = jnp.asarray(wps[wp_i], jnp.float32)
        res = ctrl(x, goal, ghosts0, spots)
        x = MODEL.step(x, res.u, SPEC, DT)
        env.step()
        min_rollout_h = min(min_rollout_h, float(res.h_min))
        # live collision check against the TRUE env
        p = np.asarray(x[:2])
        d_static = np.min(
            np.linalg.norm(p - env.static_obstacles[:, :2], axis=1)
            - env.static_obstacles[:, 2]
        )
        g = np.asarray(env.ghosts)
        act = g[:, 4] > 0
        d_ghost = np.min(
            np.linalg.norm(p - g[act, :2], axis=1) - g[act, 4]
        ) if act.any() else np.inf
        min_h = min(min_h, d_static - radius, d_ghost - radius)
        if min_h < -0.05:
            return dict(outcome="collision", min_h=min_h, steps=k,
                        min_rollout_h=min_rollout_h)
        if np.linalg.norm(p - wps[wp_i]) < 2.0:
            wp_i += 1
            if wp_i == len(wps):
                return dict(outcome="reached", min_h=min_h, steps=k,
                            min_rollout_h=min_rollout_h)
    return dict(outcome="stalled", min_h=min_h, steps=max_steps,
                min_rollout_h=min_rollout_h, wp_i=wp_i)


@pytest.mark.slow
def test_warehouse_backup_cbf_traversal():
    r = run_warehouse_level(1)
    assert r["outcome"] == "reached", r
    assert r["min_h"] > -0.05
    # the filter reasoned about a genuinely nearby hazard at least once
    assert r["min_rollout_h"] < 3.0, r


# Expected outcomes per ghost level (see the reference's leveled tables,
# warehouse_env.py:24-266).  The BackupCBF's backup set is "braked to rest";
# a parked robot is safe w.r.t. boundaries and static obstacles but NOT
# provably safe against ghosts beyond the 2.5 s validated prediction window,
# so survivability is expected to degrade with traffic density — the same
# deliberate negative-result structure as the reference's puddle_surprise
# drift case (test_drift.py:662-689).  This table records the measured
# behavior of the committed stack so regressions in either direction
# (new collisions OR silently changed dynamics) are caught.
WAREHOUSE_EXPECTED = {
    2: "reached",
    3: "reached",
    4: "reached",
    5: "reached",
    6: "reached",
    7: "reached",
}


@pytest.mark.slow
@pytest.mark.parametrize("level", sorted(WAREHOUSE_EXPECTED))
def test_warehouse_levels_closed_loop(level):
    r = run_warehouse_level(level)
    assert r["outcome"] == WAREHOUSE_EXPECTED[level], (level, r)


def test_warehouse_levels_6_7_exact_tables():
    """Levels 6-7 reproduce the reference's hand-shuffled ghost tables
    (warehouse_env.py:187-266), including the sequential reshuffle."""
    g6 = np.asarray(WarehouseEnv(level=6, dt=0.05).ghosts)
    act6 = g6[g6[:, 4] > 0]
    assert len(act6) == 28  # 11 main + 3 (lvl4) + 3 (lvl5) + 11 super-dense
    s = 2.7

    def has(x, y, vx, vy):
        m = (np.abs(act6[:, 0] - x) < 1e-4) & (np.abs(act6[:, 1] - y) < 1e-4) \
            & (np.abs(act6[:, 2] - vx) < 1e-4) & (np.abs(act6[:, 3] - vy) < 1e-4)
        return bool(m.any())

    # (5,30) sweeper: ->y=25 then left-boundary relief -> (95,25) leftward
    assert has(95.0, 25.0, -s, 0.0)
    assert not has(5.0, 30.0, s, 0.0)
    # (20,20) slow blocker redirected to (45,25) horizontal
    assert has(45.0, 25.0, 1.5, 0.0)
    # x=50 vertical sweeper shifted to x=95
    assert has(95.0, 5.0, 0.0, s)
    # x=70 vertical sweeper shifted to x=25
    assert has(25.0, 5.0, 0.0, s)
    # y=50 leftward sweeper shifted to y=55
    assert has(95.0, 55.0, -s, 0.0)
    # (80,80) blocker -> (80,85) horizontal
    assert has(80.0, 85.0, -1.5, 0.0)
    # left-boundary relief: (5,70) main -> (95,70) leftward
    assert has(95.0, 70.0, -s, 0.0)
    # mid-corridor drifter kept
    assert has(50.0, 10.0, 0.0, s * 0.45)

    g7 = np.asarray(WarehouseEnv(level=7, dt=0.05).ghosts)
    act7 = g7[g7[:, 4] > 0]
    assert len(act7) == 28  # 11 main + 17 cross-flow
    s7, fs = 2.6, 2.6 * 0.8

    def has7(x, y, vx, vy):
        m = (np.abs(act7[:, 0] - x) < 1e-4) & (np.abs(act7[:, 1] - y) < 1e-4) \
            & (np.abs(act7[:, 2] - vx) < 1e-4) & (np.abs(act7[:, 3] - vy) < 1e-4)
        return bool(m.any())

    for y in (44.0, 58.0, 72.0, 86.0):
        assert has7(5.0, y, fs, 0.0)
    for xx in (44.0, 58.0, 72.0, 86.0):
        assert has7(xx, 5.0, 0.0, fs)
    assert has7(95.0, 34.0, -fs * 1.1, 0.0)
    assert has7(95.0, 30.0, -s7, 0.0)
    assert has7(66.0, 80.0, 0.0, -fs * 1.2)
    assert has7(66.0, 60.0, 0.0, fs * 1.2)
    assert has7(20.0, 70.0, s7 * 1.02, 0.0)
    # reshuffle applies at level 7 too: (50,5) vertical -> x=95
    assert has7(95.0, 5.0, 0.0, s7)
