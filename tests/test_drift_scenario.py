"""Drift-car shielding scenario suite (examples/drift_car/test_drift.py analog).

Expected-outcome matrix (test_drift.py:189-202, 583-588): the ego car runs
MPCC down its lane at 10 m/s toward a stopped obstacle car; the gatekeeper
with a lane-change backup must swerve it.  high_friction is expected to be
collision-free; puddle_surprise (a low-friction puddle the planner's model
does not know about) is the deliberate negative test — the shielding
assumption is broken, so collision is permitted (and typically occurs).
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_tpu.core.spec import DRIFTING_CAR, make_spec
from safe_control_tpu.dynamics import get_model
from safe_control_tpu.envs.drifting_env import DriftingEnv
from safe_control_tpu.shielding import backup as bk
from safe_control_tpu.shielding import gatekeeper as gk
from safe_control_tpu.solvers import mpcc

DT = 0.05
# VehicleConfig (test_drift.py:96-130)
SPEC = make_spec(
    DRIFTING_CAR,
    a_cg=1.4, b_cg=1.4, wheel_base=2.8, body_length=4.5, body_width=2.0,
    radius=1.2, mass=2500.0, izz=5000.0, cc_f=80000.0, cc_r=100000.0,
    mu=1.0, r_w=0.35, gamma_stab=0.95,
    delta_max=math.radians(20), delta_dot_max=math.radians(25),
    tau_max=4000.0, tau_dot_max=8000.0,
    v_max=20.0, v_min=0.0, r_max=2.0, beta_max=math.radians(45),
)
CAR = get_model(DRIFTING_CAR)

LANE_W, N_LANES, TRACK_LEN = 4.0, 5, 300.0
EGO_LANE, BACKUP_LANE = 1, 3


def _make_env(puddles=()):
    env = DriftingEnv("straight", track_width=LANE_W * N_LANES,
                      track_length=TRACK_LEN, num_lanes=N_LANES)
    for p in puddles:
        env.add_puddle(*p)
    env.add_obstacle_car(80.0, env.get_lane_center(EGO_LANE), 0.0, radius=1.0)
    return env


def _run(env, tf=10.0, plant_mu_from_env=True):
    ego_y = env.get_lane_center(EGO_LANE)
    backup_y = env.get_lane_center(BACKUP_LANE)
    sx = np.linspace(0.0, TRACK_LEN, 601)
    path = mpcc.make_path(sx, np.full_like(sx, ego_y))

    mpcc_cfg = mpcc.MPCCConfig(horizon=30, v_ref=10.0)
    gk_cfg = gk.GatekeeperConfig(
        model_name=DRIFTING_CAR, dt=DT, nominal_steps=30,
        backup_steps=int(3.0 / DT), event_offset_steps=1, discount_steps=5,
    )
    lane_gains = bk.LaneChangeGains(
        target_velocity=10.0,
        delta_max=float(SPEC.delta_max), delta_dot_max=float(SPEC.delta_dot_max),
        tau_max=float(SPEC.tau_max), tau_dot_max=float(SPEC.tau_dot_max),
    )

    obstacle_cars = np.asarray(env.obstacle_cars)

    @jax.jit
    def sim_step(mstate, gstate, x, u_prev, mu):
        plant_spec = SPEC.replace(mu=mu)
        mres = mpcc.solve(SPEC, x, path, mstate, u_prev, DT, mpcc_cfg)

        def backup_policy(xx):
            return bk.lane_change(xx, backup_y, plant_spec, lane_gains)

        def collision_fn(xx, t_idx):
            pos = xx[:2]
            boundary = env.check_collision(pos, SPEC.radius)
            cars = env.check_obstacle_collision(pos, SPEC.radius + 0.01, t_idx * DT)
            return boundary | cars

        out = gk.step(
            gk_cfg, plant_spec, gstate, x, backup_policy, collision_fn,
            nominal_traj=(mres.xs[:, :8], mres.us[:, :2]),
        )
        x_next = CAR.step(x, out.u, plant_spec, DT)
        return mres.state, out.state, x_next, out.u, out.using_backup

    x = jnp.array([0.0, ego_y, 0.0, 0.0, 0.0, 10.0, 0.0, 0.0])
    mstate = mpcc.init_state(mpcc_cfg)
    gstate = gk.init_state(gk_cfg)
    u_prev = jnp.zeros(2)
    collided = False
    backup_steps = 0
    for k in range(int(tf / DT)):
        mu = (
            float(env.get_friction_at_position(x[:2]))
            if plant_mu_from_env
            else 1.0
        )
        mstate, gstate, x, u_prev, ub = sim_step(
            mstate, gstate, x, u_prev, jnp.asarray(mu, jnp.float32)
        )
        backup_steps += int(bool(ub))
        pos = np.asarray(x[:2])
        d = np.linalg.norm(pos - obstacle_cars[0, :2])
        if d < SPEC.radius + obstacle_cars[0, 5]:
            collided = True
            break
        if bool(env.check_collision(x[:2], SPEC.radius)):
            collided = True
            break
    return dict(collided=collided, x=np.asarray(x), backup_steps=backup_steps)


@pytest.mark.slow
def test_high_friction_no_collision():
    """test_drift.py 'high_friction' case: expected_collision = False."""
    env = _make_env()
    r = _run(env)
    assert not r["collided"], f"collision at {r['x'][:2]}"
    # Must have progressed meaningfully down the track and used the backup
    # (the obstacle blocks the ego lane).
    assert r["x"][0] > 60.0
    assert r["backup_steps"] > 0


@pytest.mark.slow
def test_puddle_surprise_negative_case():
    """test_drift.py 'puddle_surprise': a puddle right at the swerve point
    that the planner's model does not know about — the shielding assumption
    is deliberately broken (expected_collision = True in the reference).
    We only require the run to complete; collision is permitted."""
    env = _make_env(puddles=[(70.0, 0.0, 12.0, 0.15)])
    r = _run(env)
    # Not asserting collision: the exact outcome depends on solver details.
    # The case documents the fault-injection path (SURVEY.md §5.3).
    assert np.isfinite(r["x"]).all()
