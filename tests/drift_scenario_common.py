"""Shared driver for the drift-car shielding scenario suite.

Split across two test files (test_drift_scenario.py /
test_drift_scenario_backup.py) purely for xdist load balance: the four
compiled simulators cost ~90 s each on XLA-CPU, and `--dist loadfile`
schedules whole files, so one 400 s file serializes on a single worker.
Each file keeps its own process-local _SIM_CACHE; scenarios that share an
(algo, backup) config reuse the compile via ``reset()``.
"""

import math

import numpy as np

from safe_control_tpu.core.spec import DRIFTING_CAR, make_spec
from safe_control_tpu.envs.drifting_env import DriftingEnv
from safe_control_tpu.sim.drift_sim import DriftingCarSimulator, DriftSimConfig
from safe_control_tpu.solvers import mpcc

DT = 0.05
LANE_W, N_LANES, TRACK_LEN = 4.0, 5, 300.0
EGO_LANE, MIDDLE_LANE, BACKUP_LANE = 1, 2, 3


def _spec(mu=1.0):
    # VehicleConfig (test_drift.py:96-130)
    return make_spec(
        DRIFTING_CAR,
        a_cg=1.4, b_cg=1.4, wheel_base=2.8, body_length=4.5, body_width=2.0,
        radius=1.2, mass=2500.0, izz=5000.0, cc_f=80000.0, cc_r=100000.0,
        mu=mu, r_w=0.35, gamma_stab=0.95,
        delta_max=math.radians(20), delta_dot_max=math.radians(25),
        tau_max=4000.0, tau_dot_max=8000.0,
        v_max=20.0, v_min=0.0, r_max=2.0, beta_max=math.radians(45),
    )


_SIM_CACHE = {}


def _run(algo, backup, puddles=(), mu=1.0, tf=8.0, moving=True):
    spec = _spec(mu)
    env = DriftingEnv("straight", track_width=LANE_W * N_LANES,
                      track_length=TRACK_LEN, num_lanes=N_LANES)
    ego_y = env.get_lane_center(EGO_LANE)
    backup_y = env.get_lane_center(BACKUP_LANE)
    # reference obstacles: middle-lane mover + ego-edge slow car (:617-623)
    if moving:
        env.add_dynamic_obstacle_car(50.0, env.get_lane_center(MIDDLE_LANE),
                                     0.0, 2.0, 0.0, radius=1.0)
        env.add_dynamic_obstacle_car(35.0, 4.0, 0.0, 0.75, 0.0, radius=1.0)
    else:
        env.add_obstacle_car(60.0, ego_y, 0.0, radius=1.0)
    for p in puddles:
        env.add_puddle(p[0], ego_y if p[1] is None else p[1], p[2], p[3])

    sx = np.linspace(0.0, TRACK_LEN, 601)
    path = mpcc.make_path(sx, np.full_like(sx, ego_y))
    mcfg = mpcc.MPCCConfig(horizon=30, v_ref=10.0)
    cfg = DriftSimConfig(dt=DT, algo=algo, backup=backup, nominal_steps=30,
                         backup_steps=60, event_offset_steps=1,
                         discount_steps=5, target_velocity=10.0)
    x0 = np.array([1.0, ego_y, 0.0, 0.0, 0.0, 10.0, 0.0, 0.0])
    # One compiled simulator per (algo, backup): obstacle cars are traced
    # arguments and puddle friction is a host-side lookup, so scenarios
    # that share a config reuse the ~50 s XLA-CPU compile via reset().
    key = (algo, backup)
    sim = _SIM_CACHE.get(key)
    if sim is None:
        sim = DriftingCarSimulator(spec, env, path, x0, mcfg, cfg, backup_y)
        _SIM_CACHE[key] = sim
    else:
        sim.reset(x0, env=env)
    return sim.run(tf)
