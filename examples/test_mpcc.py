"""Pure MPCC path-following example (examples/drift_car/test_mpcc.py analog).

Usage:  python examples/test_mpcc.py --track oval|straight|l_shape [--render]

Model-predictive contouring control on the Fiala-tire drifting car with no
shielding: the car follows the track centerline at v_ref, and the example
reports progress, mean/max contouring error, and solver health (reference
test_mpcc.py checks lap progress and tracking error).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser(description="MPCC centerline tracking.")
    parser.add_argument("--track", default="oval",
                        choices=["straight", "oval", "l_shape"])
    parser.add_argument("--v_ref", type=float, default=8.0)
    parser.add_argument("--tf", type=float, default=15.0)
    parser.add_argument("--render", action="store_true")
    args = parser.parse_args()

    import math

    import jax
    import jax.numpy as jnp

    from safe_control_tpu.core.spec import DRIFTING_CAR, make_spec
    from safe_control_tpu.dynamics import get_model
    from safe_control_tpu.envs.drifting_env import DriftingEnv
    from safe_control_tpu.solvers import mpcc

    DT = 0.05
    spec = make_spec(
        DRIFTING_CAR, a_cg=1.4, b_cg=1.4, body_length=4.5, body_width=2.0,
        radius=1.2, mass=2500.0, izz=5000.0, cc_f=80000.0, cc_r=100000.0,
        mu=1.0, r_w=0.35, gamma_stab=0.95, delta_max=math.radians(20),
        delta_dot_max=math.radians(25), tau_max=4000.0, tau_dot_max=8000.0,
        v_max=20.0, v_min=0.0, r_max=2.0, beta_max=math.radians(45),
    )
    car = get_model(DRIFTING_CAR)
    env = DriftingEnv(args.track, track_width=12.0, track_length=200.0)
    cl = env.centerline_np
    path = mpcc.make_path(cl[:, 0], cl[:, 1])
    cfg = mpcc.MPCCConfig(horizon=30, v_ref=args.v_ref)

    # Start on the centerline, aligned with the initial tangent.
    tangent = cl[1] - cl[0]
    theta0 = math.atan2(tangent[1], tangent[0])
    x = jnp.array([cl[0, 0], cl[0, 1], theta0, 0.0, 0.0, args.v_ref, 0.0, 0.0])

    @jax.jit
    def sim_step(ms, x, up):
        res = mpcc.solve(spec, x, path, ms, up, DT, cfg)
        return res.state, car.step(x, res.u, spec, DT), res.u

    ms, up = mpcc.init_state(cfg), jnp.zeros(2)
    xs, errs = [], []
    off_track = False
    for _ in range(int(args.tf / DT)):
        ms, x, up = sim_step(ms, x, up)
        xn = np.asarray(x)
        xs.append(xn)
        errs.append(abs(float(env.signed_lateral_offset(xn[:2]))))
        if bool(env.check_collision(xn[:2], 0.0)):
            off_track = True
            break
    xs = np.asarray(xs)
    progress = float(np.linalg.norm(np.diff(xs[:, :2], axis=0), axis=1).sum())
    err = np.asarray(errs)
    ok = (not off_track) and progress > 0.5 * args.v_ref * args.tf and err.max() < 2.0
    print(f"track={args.track} progress={progress:.1f} m "
          f"(target >= {0.5 * args.v_ref * args.tf:.0f} m), "
          f"contouring error mean={err.mean():.2f} max={err.max():.2f} m, "
          f"off_track={off_track}")
    print("Success!" if ok else "Failed!")

    if args.render:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 6))
        ax.plot(cl[:, 0], cl[:, 1], "k--", lw=0.8, label="centerline")
        ax.plot(env.left_boundary_np[:, 0], env.left_boundary_np[:, 1], "k-", lw=0.5)
        ax.plot(env.right_boundary_np[:, 0], env.right_boundary_np[:, 1], "k-", lw=0.5)
        ax.plot(xs[:, 0], xs[:, 1], "b-", label="MPCC")
        ax.set_aspect("equal")
        ax.legend()
        fig.savefig(f"mpcc_{args.track}.png", dpi=120)
        print(f"saved mpcc_{args.track}.png")

    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
