"""Warehouse e2e: BackupCBF traversal + gatekeeper survivability table.

Drives safe_control_tpu/sim/warehouse_sim.py (see its docstring for the
architecture): BackupCBF + stop backup reaches the goal at level 1 but
collides at level >= 2 ("braked to rest" is not invariant under corridor
sweepers — a deliberate negative result in the reference's puddle_surprise
style, test_drift.py:662-689); the gatekeeper with an evade-to-safe-spot
backup, bounce-exact ghost predictions, and a terminal invariant-set gate
is collision-free at EVERY ghost level 1-7, trading liveness on route legs
whose waypoints sit inside sweeper lanes.
"""

import numpy as np
import pytest

from safe_control_tpu.envs.warehouse_env import WarehouseEnv
from safe_control_tpu.sim.warehouse_sim import (
    run_backup_cbf_level,
    run_gatekeeper_level,
)


@pytest.mark.slow
def test_warehouse_backup_cbf_traversal():
    r = run_backup_cbf_level(1)
    assert r["outcome"] == "reached", r
    assert r["min_h"] > -0.05
    # the filter reasoned about a genuinely nearby hazard at least once
    assert r["min_rollout_h"] < 3.0, r


# Measured behavior of the committed stack: the stop backup survives only
# the lightest traffic.  Regressions in EITHER direction (new collisions at
# level 1 or silently changed dynamics making upper levels "pass") are
# caught.
BCBF_EXPECTED = {2: "collision", 3: "collision", 4: "collision",
                 5: "collision", 6: "collision", 7: "collision"}


@pytest.mark.slow
@pytest.mark.parametrize("level", sorted(BCBF_EXPECTED))
def test_warehouse_bcbf_levels_expected_outcome(level):
    r = run_backup_cbf_level(level)
    assert r["outcome"] == BCBF_EXPECTED[level], (level, r)


@pytest.mark.slow
@pytest.mark.parametrize("level", [1, 2, 3, 4, 5, 6, 7])
def test_warehouse_gatekeeper_survives_every_level(level):
    """The survivability table: with commitment shielding, EVERY ghost level
    is collision-free; shields measurably engage; the robot makes progress
    past the first leg before (on dense levels) correctly holding position
    rather than entering a lane it cannot guarantee exiting."""
    r = run_gatekeeper_level(level)
    assert r["outcome"] != "collision", (level, r)
    assert r["min_h"] > -0.05, (level, r)
    assert r["backup_steps"] > 0, (level, r)
    assert r["wp_i"] >= 2, (level, r)


def test_warehouse_fold_prediction_is_bounce_exact():
    """The gatekeeper's triangle-wave ghost prediction has ZERO model error
    at sample times: the env reflects positions off the reference's [2, 98]
    bounce band, so fold_position(x0 + v*t) reproduces the stepped ghost
    path exactly (the ADVICE round-3 finding was that velocity-flip-only
    bouncing lagged the fold by up to 2|v|dt = 0.8 m > GHOST_MARGIN)."""
    from safe_control_tpu.envs.warehouse_env import fold_position

    env = WarehouseEnv(level=3, dt=0.1)
    g0 = np.asarray(env._ghosts).copy()
    act = g0[:, 4] > 0
    n = 400  # several bounces for the fast sweepers
    for _ in range(n):
        env.step()
    g = np.asarray(env._ghosts)[act]
    t = n * env.dt
    px = np.asarray(fold_position(g0[act, 0] + g0[act, 2] * t))
    py = np.asarray(fold_position(g0[act, 1] + g0[act, 3] * t))
    assert np.abs(px - g[:, 0]).max() < 1e-9
    assert np.abs(py - g[:, 1]).max() < 1e-9


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
