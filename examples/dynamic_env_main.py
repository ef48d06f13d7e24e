"""Dynamic-obstacle environment demo (dynamic_env/main.py analog).

Usage: python examples/dynamic_env_main.py --model dpcbf|c3bf [--render]

8 bouncing dynamic obstacles, KinematicBicycle2D with DPCBF (the flagship
ICRA'26 barrier) or C3BF under CBF-QP.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BASE_OBS = np.array(
    [
        [8.0, 9.0, 0.5], [10.0, 4.0, 0.5], [12.0, 5.0, 0.5], [14.0, 9.0, 0.5],
        [16.0, 6.0, 0.5], [18.0, 14.0, 0.5], [20.0, 4.0, 0.5], [22.0, 12.0, 0.5],
    ]
)
VELS = np.array(
    [[-0.5, 0.5] if i % 2 == 0 else [-0.5, -0.5] for i in range(len(BASE_OBS))]
)
WAYPOINTS = np.array([[1.0, 7.5], [20.0, 7.5]])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="dpcbf", choices=["dpcbf", "c3bf"])
    parser.add_argument("--render", action="store_true")
    parser.add_argument("--tf", type=float, default=60.0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from safe_control_tpu.core.spec import (
        KINEMATIC_BICYCLE_2D_C3BF,
        KINEMATIC_BICYCLE_2D_DPCBF,
        make_spec,
    )
    from safe_control_tpu.core.types import pad_obstacles
    from safe_control_tpu.sim import tracking

    name = (
        KINEMATIC_BICYCLE_2D_DPCBF if args.model == "dpcbf"
        else KINEMATIC_BICYCLE_2D_C3BF
    )
    spec = make_spec(name, a_max=5.0, radius=0.3)
    cfg = tracking.TrackerConfig(
        model_name=name, pos_controller="cbf_qp", dt=0.05, num_obs=8
    )
    obs = pad_obstacles(
        jnp.asarray(np.hstack([BASE_OBS, VELS, np.zeros((len(BASE_OBS), 2))])), 8
    )
    wps = jnp.asarray(WAYPOINTS, dtype=jnp.float32)
    st = tracking.init_state(
        cfg, spec, jnp.array([1.0, 7.5, 0.0, 1.0]), 0.0, first_goal=WAYPOINTS[0]
    )

    run = jax.jit(
        lambda st, obs: tracking.run_dynamic(
            cfg, spec, st, wps, jnp.asarray(2), obs,
            n_steps=int(args.tf / cfg.dt), y_range=(0.0, 15.0),
        )
    )
    final, obs_final, traj = run(st, obs)
    rets = np.asarray(traj["ret"])
    ok = int(final.ret) == tracking.RET_DONE and not np.any(rets == -2)
    print(f"{name}: final ret {int(final.ret)}, "
          f"infeasible/collision steps {(rets == -2).sum()}")
    print("Success!" if ok else "Failed!")

    if args.render:
        from safe_control_tpu.viz.plotting import Plotting

        plot = Plotting(22.0, 15.0, [])
        ax, fig = plot.plot_grid(f"Dynamic env ({args.model})")
        xs = np.asarray(traj["x"])
        plot.plot_trajectory(ax, xs)
        plot.plot_waypoints(ax, WAYPOINTS)
        for row in np.asarray(obs_final):
            ax.add_patch(__import__("matplotlib.pyplot", fromlist=["x"]).Circle(
                row[:2], row[2], facecolor="orange", alpha=0.5, edgecolor="black"))
        out = f"dynamic_env_{args.model}.png"
        fig.savefig(out, dpi=120)
        print(f"saved {out}")


if __name__ == "__main__":
    main()
