"""Unknown-environment tracking example (examples/test_unknown_env.py analog).

Usage:
    python examples/test_unknown_env.py --model du --algo mpc_cbf \
        --att_algo velocity_tracking_yaw --unknown_detection fov [--render]

Full reference parity: the indoor course (8 waypoints with sharp turns,
interior superellipsoid walls, known furniture, 24 unknown pillars placed on
the route corridors — reference test_unknown_env.py:7-103), the per-model
robot specs (:105-188), the algo tuning (:191-209), and the CLI axes
``--model si|di|un|du|kb|quad --algo cbf_qp|mpc_cbf --att_algo ...
--unknown_detection fov|ray --tf`` (:211-243).  The robot only learns about
unknown obstacles through RGB-D FoV/ray detection; success iff all waypoints
are reached with no collision/infeasibility (:330-335).

Runs through the public ``LocalTrackingController`` wrapper (the reference
API surface), which owns the jitted functional tracker.
"""

import argparse
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MODEL_MAP = {
    "si": "SingleIntegrator2D",
    "di": "DoubleIntegrator2D",
    "un": "Unicycle2D",
    "du": "DynamicUnicycle2D",
    "kb": "KinematicBicycle2D",
    "quad": "Quad2D",
}


def build_indoor_env():
    """Reference course, un-condensed (test_unknown_env.py:7-103)."""
    env_width, env_height = 24.0, 18.0
    waypoints = np.array(
        [
            [2.0, 2.0, math.pi / 2],
            [2.0, 15.0, 0.0],
            [9.4, 15.0, -math.pi / 2],
            [9.4, 5.0, 0.0],
            [16.6, 5.0, math.pi / 2],
            [16.6, 13.0, 0.0],
            [22.0, 13.0, -math.pi / 2],
            [22.0, 3.0, 0.0],
        ]
    )
    e_wall = 6.0
    interior_walls = np.array(
        [
            [6.0, 8.0, 0.22, 6.0, e_wall, 0.0, 1.0],
            [7.4, 11.0, 1.4, 0.18, e_wall, 0.0, 1.0],
            [12.8, 11.0, 1.4, 0.18, e_wall, 0.0, 1.0],
            [13.0, 11.0, 0.18, 5.5, e_wall, 0.0, 1.0],
            [14.7, 7.0, 1.3, 0.18, e_wall, 0.0, 1.0],
            [18.6, 7.0, 1.0, 0.18, e_wall, 0.0, 1.0],
            [19.0, 7.0, 0.18, 5.5, e_wall, 0.0, 1.0],
        ]
    )
    known_circles = np.hstack(
        [
            np.array(
                [[4.0, 4.0, 0.60], [8.0, 3.0, 0.55], [14.5, 14.8, 0.75],
                 [20.8, 6.5, 0.65]]
            ),
            np.zeros((4, 4)),
        ]
    )
    known_furniture = np.array(
        [
            [4.3, 11.2, 0.90, 0.50, 6.0, np.pi / 10, 1.0],
            [15.2, 3.0, 0.95, 0.40, 4.0, -np.pi / 7, 1.0],
            [20.9, 10.9, 0.80, 0.55, 6.0, np.pi / 7, 1.0],
        ]
    )
    known_obs = np.vstack([known_circles, interior_walls, known_furniture])
    unknown_obs = np.array(
        [
            [2.45, 4.3, 0.19], [1.60, 7.0, 0.19], [2.40, 10.2, 0.19],
            [1.65, 13.1, 0.19],
            [3.5, 14.6, 0.19], [6.0, 15.35, 0.19], [8.3, 14.6, 0.19],
            [8.95, 13.3, 0.19], [9.85, 10.8, 0.19], [8.95, 8.0, 0.19],
            [9.85, 6.0, 0.19],
            [10.9, 5.45, 0.19], [13.0, 4.55, 0.19], [15.1, 5.45, 0.19],
            [16.15, 6.8, 0.19], [17.05, 9.0, 0.19], [16.15, 11.2, 0.19],
            [18.2, 12.6, 0.19], [20.2, 13.4, 0.19], [21.4, 12.6, 0.19],
            [21.55, 11.0, 0.19], [22.45, 8.8, 0.19], [21.55, 6.3, 0.19],
            [22.45, 4.2, 0.19],
        ]
    )
    return env_width, env_height, waypoints, known_obs, unknown_obs


def get_robot_spec(model, unknown_detection):
    """Per-model specs (reference test_unknown_env.py:105-188)."""
    specs = {
        "SingleIntegrator2D": {"v_max": 1.0, "radius": 0.25, "sensor": "rgbd"},
        "DoubleIntegrator2D": {
            "v_max": 1.5, "a_max": 1.8, "radius": 0.23, "sensor": "rgbd",
            "fov_angle": 70.0, "cam_range": 4.5, "num_constraints": 10,
            "reached_threshold": 0.45, "nominal_k_v": 1.8, "nominal_k_a": 2.0,
        },
        "Unicycle2D": {"w_max": 0.5, "a_max": 0.5, "radius": 0.25, "sensor": "rgbd"},
        "DynamicUnicycle2D": {
            "w_max": 0.8, "a_max": 1.3, "v_max": 1.4, "radius": 0.23,
            "sensor": "rgbd", "num_constraints": 6, "reached_threshold": 0.45,
            "nominal_k_v": 1.6, "nominal_k_a": 1.8, "nominal_k_omega": 2.8,
        },
        "KinematicBicycle2D": {"a_max": 0.5, "radius": 0.50, "sensor": "rgbd"},
        "Quad2D": {"f_min": 3.0, "f_max": 10.0, "radius": 0.25, "sensor": "rgbd"},
    }
    spec = dict(specs[model])
    spec["model"] = model
    if spec.get("sensor") == "rgbd":
        spec.setdefault("fov_angle", 90.0)
        spec.setdefault("cam_range", 4.5)
        spec["unknown_obs_detection"] = unknown_detection
    return spec


def apply_algo_tuning(robot_spec, algo):
    """Reference test_unknown_env.py:191-209."""
    model = robot_spec.get("model")
    if model not in ("DynamicUnicycle2D", "DoubleIntegrator2D"):
        return robot_spec
    if algo == "cbf_qp":
        robot_spec["cbf_alpha1"] = 1.5
        robot_spec["cbf_alpha2"] = 1.5
    elif algo == "mpc_cbf":
        if model == "DoubleIntegrator2D":
            robot_spec["mpc_horizon"] = 9
            robot_spec["mpc_cbf_alpha1"] = 0.32
            robot_spec["mpc_cbf_alpha2"] = 0.32
        else:
            robot_spec["mpc_horizon"] = 7
            robot_spec["mpc_cbf_alpha1"] = 0.26
            robot_spec["mpc_cbf_alpha2"] = 0.26
    return robot_spec


def _save_frame(anim, ctrl, traj, unknown_obs, waypoints, W, H, model, algo):
    """One frame: workspace + unknown-obstacle outlines + trajectory + the
    live perception state — accumulated sensing footprint, FoV sector, and
    the braking-distance safety area the tracker checked this step
    (robots/robot.py:180-334, 646-741)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Circle

    from safe_control_tpu.viz.plotting import (
        Plotting, draw_fov_sector, draw_footprint, draw_safety_area,
    )

    plot = Plotting(W, H, ctrl.obs)
    ax, fig = plot.plot_grid(f"{model} ({algo})")
    for ob in unknown_obs:
        ax.add_patch(Circle(ob[:2], ob[2], ec="orange", fc="none", ls="--"))
    plot.plot_waypoints(ax, waypoints)
    plot.plot_trajectory(ax, traj)
    pos = traj[-1][:2]
    yaw = float(ctrl.state.yaw)
    if ctrl.cfg.grid is not None:
        draw_footprint(ax, ctrl.state.footprint, ctrl.cfg.grid)
        if ctrl.last_safety_mask is not None \
                and ctrl.last_safety_mask.shape != (1, 1):
            draw_safety_area(ax, ctrl.last_safety_mask, ctrl.cfg.grid)
    draw_fov_sector(ax, pos, yaw, ctrl.spec)
    ax.plot(*pos, "o", color="tab:blue", ms=6, zorder=6)
    anim.save_frame(fig)
    plt.close(fig)


def main():
    parser = argparse.ArgumentParser(
        description="Unknown-obstacle tracking in an indoor-like environment."
    )
    parser.add_argument("--model", default="du", choices=list(MODEL_MAP))
    parser.add_argument("--algo", default="mpc_cbf", choices=["cbf_qp", "mpc_cbf"])
    parser.add_argument(
        "--att_algo", default="velocity_tracking_yaw",
        choices=["simple", "velocity_tracking_yaw", "visibility_area",
                 "visibility_raycast", "gatekeeper"],
    )
    parser.add_argument("--unknown_detection", default="fov", choices=["fov", "ray"])
    parser.add_argument("--render", action="store_true")
    parser.add_argument("--save_anim", action="store_true",
                        help="per-frame replay -> mp4 showing footprint "
                             "growth, FoV sector, and safety area")
    parser.add_argument("--anim_every", type=int, default=4)
    parser.add_argument("--tf", type=float, default=120.0)
    args = parser.parse_args()

    from safe_control_tpu.envs.env import Env
    from safe_control_tpu.sim import tracking
    from safe_control_tpu.sim.controller import LocalTrackingController

    W, H, waypoints, known_obs, unknown_obs = build_indoor_env()
    model = MODEL_MAP[args.model]
    robot_spec = apply_algo_tuning(get_robot_spec(model, args.unknown_detection),
                                   args.algo)
    env = Env(width=W, height=H, known_obs=known_obs, resolution=0.2)
    x0 = list(waypoints[0][:2]) + [waypoints[0][2]]
    ctrl = LocalTrackingController(
        x0, robot_spec,
        controller_type={"pos": args.algo, "att": args.att_algo},
        dt=0.05, env=env, enable_rotation=True,
    )
    ctrl.obs = np.hstack([known_obs, np.zeros((len(known_obs), 7 - known_obs.shape[1]))]) \
        if known_obs.shape[1] < 7 else known_obs
    ctrl.set_unknown_obs(unknown_obs)
    ctrl.set_waypoints(waypoints)

    anim = None
    if args.save_anim:
        from safe_control_tpu.viz.plotting import AnimationSaver

        anim = AnimationSaver()
    rets = []
    traj = []
    for k in range(int(args.tf / 0.05)):
        ret = ctrl.control_step()
        rets.append(ret)
        traj.append(ctrl.robot_state.copy())
        if anim is not None and k % args.anim_every == 0:
            _save_frame(anim, ctrl, np.asarray(traj), unknown_obs, waypoints,
                        W, H, model, args.algo)
        if ret in (tracking.RET_DONE, tracking.RET_INFEASIBLE):
            break
    if anim is not None:
        print("video:",
              anim.export_video(f"unknown_env_{args.model}_{args.algo}.mp4"))
    rets = np.asarray(rets)
    collided = bool(np.any(rets == tracking.RET_INFEASIBLE))
    done = rets[-1] == tracking.RET_DONE
    violations = int(np.sum(rets == tracking.RET_VISIBILITY))
    detected = int(np.asarray(ctrl.state.mem.valid).sum())
    print(
        f"model={model} algo={args.algo} att={args.att_algo} "
        f"detection={args.unknown_detection}: waypoints reached: {bool(done)}, "
        f"collision/infeasible: {collided}, visibility violations: {violations}, "
        f"unknown obstacles in memory: {detected}/{len(unknown_obs)}"
    )
    print("Success!" if done and not collided else "Failed!")

    if args.render:
        from matplotlib.patches import Circle

        from safe_control_tpu.viz.plotting import Plotting

        plot = Plotting(W, H, known_obs)
        ax, fig = plot.plot_grid(f"Unknown env ({model}, {args.algo})")
        for ob in unknown_obs:
            ax.add_patch(Circle(ob[:2], ob[2], ec="orange", fc="none", ls="--"))
        plot.plot_waypoints(ax, waypoints)
        plot.plot_trajectory(ax, np.asarray(traj))
        out = f"unknown_env_{args.model}_{args.algo}.png"
        fig.savefig(out, dpi=120)
        print(f"saved {out}")

    return 0 if done and not collided else 1


if __name__ == "__main__":
    sys.exit(main())
