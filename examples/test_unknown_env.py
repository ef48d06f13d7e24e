"""Unknown-environment tracking example (examples/test_unknown_env.py analog).

Usage:  python examples/test_unknown_env.py --algo cbf_qp [--render]

The robot navigates an indoor course where most obstacles are UNKNOWN: it
only learns about them through RGB-D FoV detection with persistent memory
(reference robots/robot.py:773-834, utils/detection.py).  Success iff all
waypoints are reached with no collision/infeasibility — the reference
predicate (test_unknown_env.py:330-335).
"""

import argparse
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Indoor scenario (reference test_unknown_env.py:7-96 layout, condensed):
# a corridor course with known superellipsoid walls and unknown pillars.
WAYPOINTS = np.array(
    [
        [2.0, 2.0, math.pi / 2],
        [2.0, 15.0, 0.0],
        [9.4, 15.0, -math.pi / 2],
        [9.4, 5.0, 0.0],
        [16.6, 5.0, math.pi / 2],
        [16.6, 13.0, 0.0],
    ]
)
E_WALL = 6.0
KNOWN_OBS = np.vstack(
    [
        np.hstack(
            [
                np.array([[4.0, 4.0, 0.60], [8.0, 3.0, 0.55], [14.5, 14.8, 0.75]]),
                np.zeros((3, 4)),
            ]
        ),
        np.array(
            [
                [6.0, 8.0, 0.22, 6.0, E_WALL, 0.0, 1.0],
                [7.4, 11.0, 1.4, 0.18, E_WALL, 0.0, 1.0],
                [12.8, 11.0, 1.4, 0.18, E_WALL, 0.0, 1.0],
                [13.0, 11.0, 0.18, 5.5, E_WALL, 0.0, 1.0],
                [4.3, 11.2, 0.90, 0.50, 6.0, np.pi / 10, 1.0],
            ]
        ),
    ]
)
UNKNOWN_OBS = np.array(
    [
        [2.45, 4.3, 0.19], [1.60, 7.0, 0.19], [2.40, 10.2, 0.19],
        [1.65, 13.1, 0.19], [3.5, 14.6, 0.19], [6.0, 15.35, 0.19],
        [8.3, 14.6, 0.19], [8.95, 13.3, 0.19], [9.85, 10.8, 0.19],
        [8.95, 8.0, 0.19], [9.85, 6.0, 0.19], [10.9, 5.45, 0.19],
        [13.0, 4.55, 0.19], [15.1, 5.45, 0.19], [16.15, 6.8, 0.19],
    ]
)


def main():
    parser = argparse.ArgumentParser(description="Tracking in an unknown env.")
    parser.add_argument("--algo", default="cbf_qp", choices=["cbf_qp", "mpc_cbf"])
    parser.add_argument("--render", action="store_true")
    parser.add_argument("--tf", type=float, default=120.0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from safe_control_tpu.core.spec import DOUBLE_INTEGRATOR_2D, make_spec
    from safe_control_tpu.core.types import pad_obstacles
    from safe_control_tpu.sim import tracking

    spec = make_spec(
        DOUBLE_INTEGRATOR_2D, v_max=1.5, a_max=1.8, radius=0.23,
        fov_angle=math.radians(70.0), cam_range=4.5,
        nominal_k_v=1.8, nominal_k_a=2.0, reached_threshold=0.45,
    )
    cfg = tracking.TrackerConfig(
        model_name=DOUBLE_INTEGRATOR_2D, pos_controller=args.algo, dt=0.05,
        num_obs=10, use_sensor=True, mem_slots=24, reached_threshold=0.45,
    )
    known = pad_obstacles(jnp.asarray(KNOWN_OBS), 12)
    unknown = pad_obstacles(jnp.asarray(UNKNOWN_OBS), 16)
    wps = jnp.asarray(WAYPOINTS[:, :2], dtype=jnp.float32)
    st = tracking.init_state(
        cfg, spec, jnp.array([2.0, 2.0, 0.0, 0.0]), math.pi / 2,
        first_goal=WAYPOINTS[0][:2],
    )
    run = jax.jit(
        lambda st: tracking.run(
            cfg, spec, st, wps, jnp.asarray(len(WAYPOINTS)), known,
            n_steps=int(args.tf / cfg.dt), unknown_obs=unknown,
        )
    )
    final, traj = run(st)
    rets = np.asarray(traj["ret"])
    collided = bool(np.any(rets == tracking.RET_INFEASIBLE))
    done = int(final.ret) == tracking.RET_DONE
    detected = int(final.mem.valid.sum())
    print(f"waypoints reached: {done}, collision/infeasible: {collided}, "
          f"unknown obstacles detected: {detected}/{len(UNKNOWN_OBS)}")
    print("Success!" if done and not collided else "Failed!")

    if args.render:
        from safe_control_tpu.viz.plotting import Plotting

        plot = Plotting(18.0, 17.0, KNOWN_OBS)
        ax, fig = plot.plot_grid(f"Unknown env ({args.algo})")
        for ob in UNKNOWN_OBS:
            ax.add_patch(__import__("matplotlib.patches", fromlist=["Circle"])
                         .Circle(ob[:2], ob[2], ec="orange", fc="none", ls="--"))
        plot.plot_waypoints(ax, WAYPOINTS)
        plot.plot_trajectory(ax, np.asarray(traj["x"]))
        out = f"unknown_env_{args.algo}.png"
        fig.savefig(out, dpi=120)
        print(f"saved {out}")

    return 0 if done and not collided else 1


if __name__ == "__main__":
    sys.exit(main())
