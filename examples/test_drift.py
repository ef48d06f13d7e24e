"""Drift-car shielding suite (examples/drift_car/test_drift.py analog).

Usage: python examples/test_drift.py --test high_friction|puddle_surprise|all

Each case is a config with an expected collision outcome; '--test all' runs
the suite and prints a pass/fail summary (reference :746-777).  The
puddle_surprise case is the deliberate negative test: a low-friction puddle
the planner's model does not know about (reference :609-689).
"""

import argparse
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CASES = {
    "high_friction": dict(puddles=[], expected_collision=False),
    "low_friction": dict(puddles=[(0.0, 0.0, 1e9, 0.45)], expected_collision=False),
    # The swerve region is pure ice (mu=0.05): the gatekeeper's validation
    # model (nominal mu) is wrong exactly where the evasive action happens —
    # the deliberate shielding-assumption break.  (Our stack survives the
    # reference's milder mu=0.3 puddle, so the fault is made harsher.)
    "puddle_surprise": dict(puddles=[(75.0, 2.0, 18.0, 0.05)], expected_collision=True),
}


def run_case(name):
    import jax
    import jax.numpy as jnp

    from safe_control_tpu.core.spec import DRIFTING_CAR, make_spec
    from safe_control_tpu.dynamics import get_model
    from safe_control_tpu.envs.drifting_env import DriftingEnv
    from safe_control_tpu.shielding import backup as bk
    from safe_control_tpu.shielding import gatekeeper as gk
    from safe_control_tpu.solvers import mpcc

    case = CASES[name]
    DT = 0.05
    spec = make_spec(
        DRIFTING_CAR, a_cg=1.4, b_cg=1.4, body_length=4.5, body_width=2.0,
        radius=1.2, mass=2500.0, izz=5000.0, cc_f=80000.0, cc_r=100000.0,
        mu=1.0, r_w=0.35, gamma_stab=0.95, delta_max=math.radians(20),
        delta_dot_max=math.radians(25), tau_max=4000.0, tau_dot_max=8000.0,
        v_max=20.0, v_min=0.0, r_max=2.0, beta_max=math.radians(45),
    )
    car = get_model(DRIFTING_CAR)
    env = DriftingEnv("straight", track_width=20.0, track_length=300.0, num_lanes=5)
    for p in case["puddles"]:
        env.add_puddle(*p)
    ego_y = env.get_lane_center(1)
    backup_y = env.get_lane_center(3)
    env.add_obstacle_car(80.0, ego_y, 0.0, radius=1.0)

    sx = np.linspace(0, 300, 601)
    path = mpcc.make_path(sx, np.full_like(sx, ego_y))
    mcfg = mpcc.MPCCConfig(horizon=30, v_ref=10.0)
    gcfg = gk.GatekeeperConfig(
        model_name=DRIFTING_CAR, dt=DT, nominal_steps=30, backup_steps=60,
        event_offset_steps=1, discount_steps=5,
    )
    gains = bk.LaneChangeGains(
        target_velocity=10.0, delta_max=float(spec.delta_max),
        delta_dot_max=float(spec.delta_dot_max), tau_max=4000.0, tau_dot_max=8000.0,
    )

    @jax.jit
    def sim_step(ms, gs, x, up, mu):
        plant = spec.replace(mu=mu)
        mres = mpcc.solve(spec, x, path, ms, up, DT, mcfg)  # planner: nominal mu

        def bp(xx):
            return bk.lane_change(xx, backup_y, plant, gains)

        def cf(xx, t):
            return env.check_collision(xx[:2], spec.radius) | env.check_obstacle_collision(
                xx[:2], spec.radius + 0.01, t * DT)

        out = gk.step(gcfg, plant, gs, x, bp, cf,
                      nominal_traj=(mres.xs[:, :8], mres.us[:, :2]))
        return mres.state, out.state, car.step(x, out.u, plant, DT), out.u

    x = jnp.array([0.0, ego_y, 0.0, 0.0, 0.0, 10.0, 0.0, 0.0])
    ms, gs, up = mpcc.init_state(mcfg), gk.init_state(gcfg), jnp.zeros(2)
    obst = np.asarray(env.obstacle_cars)[0]
    collided = False
    for k in range(int(12.0 / DT)):
        mu = float(env.get_friction_at_position(x[:2]))
        ms, gs, x, up = sim_step(ms, gs, x, up, jnp.asarray(mu, jnp.float32))
        if (
            np.linalg.norm(np.asarray(x[:2]) - obst[:2]) < spec.radius + obst[5]
            or bool(env.check_collision(x[:2], spec.radius))
        ):
            collided = True
            break
    return dict(collision=collided, x=np.asarray(x))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--test", default="all", choices=list(CASES) + ["all"])
    args = parser.parse_args()
    names = list(CASES) if args.test == "all" else [args.test]
    results = {}
    for name in names:
        r = run_case(name)
        expected = CASES[name]["expected_collision"]
        ok = r["collision"] == expected
        results[name] = ok
        print(
            f"{name:18s}: collision={r['collision']} (expected {expected}) "
            f"-> {'PASS' if ok else 'FAIL'}  final x={r['x'][:2].round(1)}"
        )
    print("=" * 50)
    print(f"{sum(results.values())}/{len(results)} cases passed")


if __name__ == "__main__":
    main()
