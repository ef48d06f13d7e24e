"""Evade "bullet bill" scenario (examples/evade/test_evade.py analog).

Usage: python examples/test_evade.py --algo gatekeeper|mps|backupcbf

Pass criterion (reference :537-542): goal reached AND no collision.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--algo", default="gatekeeper",
                        choices=["gatekeeper", "mps", "backupcbf"])
    parser.add_argument("--tf", type=float, default=60.0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from safe_control_tpu.core.spec import DOUBLE_INTEGRATOR_2D, make_spec
    from safe_control_tpu.dynamics import get_model
    from safe_control_tpu.envs.evade_env import EvadeEnv
    from safe_control_tpu.shielding import backup as bk
    from safe_control_tpu.shielding import backup_cbf
    from safe_control_tpu.shielding import gatekeeper as gk

    DT = 0.1
    env = EvadeEnv(hallway_length=60.0, hallway_width=4.0, pocket_x=25.0,
                   pocket_length=10.0, pocket_width=4.0, goal_length=5.0,
                   bullet_speed=3.0, bullet_width=4.0, bullet_length=3.0,
                   bullet_start_x=-10.0)
    spec = make_spec(DOUBLE_INTEGRATOR_2D, radius=0.5, a_max=2.0, v_max=1.5)
    model = get_model(DOUBLE_INTEGRATOR_2D)
    ecfg = bk.EvadeConfig(
        pocket_center=env.pocket_center, pocket_x_min=env.pocket_x_min,
        pocket_x_max=env.pocket_x_max, pocket_y_min=env.pocket_y_min,
        pocket_y_max=env.pocket_y_max, goal_x_min=env.goal_x_min,
        goal_x_max=env.goal_x_max, goal_y_min=-env.half_width,
        goal_y_max=env.half_width, has_goal=True,
    )

    def nominal(x):
        a = jnp.array([2.0 * (spec.v_max - x[2]), 2.0 * (0.0 - x[1]) + 2.0 * (0.0 - x[3])])
        m = jnp.linalg.norm(a)
        return a * jnp.where(m > spec.a_max, spec.a_max / jnp.maximum(m, 1e-9), 1.0)

    def backup(x):
        return bk.evade(x, ecfg, spec)

    if args.algo in ("gatekeeper", "mps"):
        cfg = gk.GatekeeperConfig(
            model_name=DOUBLE_INTEGRATOR_2D, dt=DT, nominal_steps=100,
            backup_steps=120, event_offset_steps=1, discount_steps=5,
            mps_mode=(args.algo == "mps"),
        )
        gstate = gk.init_state(cfg)

        @jax.jit
        def sim_step(gstate, x, bx):
            def cf(xx, t):
                b = bx + env.bullet_speed * t * DT
                return env.check_collision(xx[:2], spec.radius) | env.check_bullet_collision(
                    xx[:2], spec.radius + 0.5, b)
            out = gk.step(cfg, spec, gstate, x, backup, cf, nominal_policy=nominal)
            return out.state, model.step(x, out.u, spec, DT), out.using_backup
    else:
        bcfg = backup_cbf.BackupCBFConfig(
            model_name=DOUBLE_INTEGRATOR_2D, dt=DT, backup_steps=120)

        def h_safety_f(bx):
            def h(xx, t):
                px, py = xx[0], xx[1]
                r = spec.radius
                in_px = (px >= env.pocket_x_min) & (px <= env.pocket_x_max)
                htop = jnp.where(in_px, env.pocket_y_max - py - r, env.half_width - py - r)
                b = bx + env.bullet_speed * t
                dx = jnp.maximum(jnp.abs(px - b) - 2.0, 0.0)
                dy = jnp.maximum(jnp.abs(py) - 2.0, 0.0)
                # margin 1.0: with 0.5 the filter cuts the pocket entrance
                # too fine against the 4 m-wide bullet corridor
                return jnp.min(jnp.stack([
                    py + env.half_width - r, px - r, env.hallway_length - px - r,
                    htop, jnp.sqrt(dx**2 + dy**2 + 1e-9) - r - 1.0]))
            return h

        def h_term(xx):
            m = spec.radius + 0.2
            return jnp.min(jnp.stack([
                xx[0] - env.pocket_x_min - m, env.pocket_x_max - xx[0] - m,
                xx[1] - env.pocket_y_min - m, env.pocket_y_max - xx[1] - m,
                spec.v_max - jnp.hypot(xx[2], xx[3])]))

        @jax.jit
        def sim_step(_, x, bx):
            res = backup_cbf.solve(bcfg, spec, x, nominal(x), backup,
                                   h_safety_f(bx), h_term)
            return None, model.step(x, res.u, spec, DT), res.using_backup

        gstate = None

    x = jnp.array([20.0, 0.0, 0.0, 0.0])
    bx = env.bullet_start_x
    collided = goal = False
    backup_steps = 0
    for k in range(int(args.tf / DT)):
        gstate, x, ub = sim_step(gstate, x, jnp.asarray(bx, jnp.float32))
        backup_steps += int(bool(ub))
        bx += env.bullet_speed * DT
        if bx > env.hallway_length + env.bullet_length:
            bx = env.bullet_start_x
        if bool(env.check_bullet_collision(x[:2], spec.radius, jnp.asarray(bx))):
            collided = True
            break
        if bool(env.check_goal_reached(x[:2])):
            goal = True
            break
    print(f"algo={args.algo}: goal={goal} collided={collided} "
          f"pos={np.asarray(x[:2]).round(2)} backup_steps={backup_steps}")
    # BackupCBF with a pocket terminal set is conservative by design: when no
    # goal-reaching trajectory is certifiably safe against the bullet period,
    # staying near the pocket forever is the correct answer -> "Safe".
    print("Success!" if goal and not collided else
          ("Safe (no goal yet)" if not collided else "Failed!"))


if __name__ == "__main__":
    main()
