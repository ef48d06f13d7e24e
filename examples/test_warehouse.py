"""Warehouse case study: leveled ghost traffic + shielding.

Usage:
    python examples/test_warehouse.py --level 3 --algo gatekeeper [--render]
    python examples/test_warehouse.py --level 1 --algo backupcbf

Drives the reference's warehouse scenario (100x100 grid world, 16 static
shelves, leveled bouncing "ghost" obstacles — warehouse_env.py:24-266)
closed-loop with either BackupCBF (stop backup; survives level 1 only) or
gatekeeper commitment shielding (evade-to-safe-spot backup + bounce-exact
ghost prediction; collision-free at EVERY level).  See
safe_control_tpu/sim/warehouse_sim.py for the architecture notes.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--level", type=int, default=1, choices=range(8))
    parser.add_argument("--algo", default="gatekeeper",
                        choices=["backupcbf", "gatekeeper"])
    parser.add_argument("--steps", type=int, default=1200)
    parser.add_argument("--render", action="store_true")
    args = parser.parse_args()

    from safe_control_tpu.sim import warehouse_sim as ws

    record = []
    if args.algo == "backupcbf":
        r = ws.run_backup_cbf_level(args.level, max_steps=args.steps,
                                    record=record)
    else:
        r = ws.run_gatekeeper_level(args.level, max_steps=args.steps,
                                    record=record)
    print(f"level={args.level} algo={args.algo}: {r}")
    safe = r["outcome"] != "collision"
    print("Success!" if (r["outcome"] == "reached"
                         or (args.algo == "gatekeeper" and safe))
          else "Failed!")

    if args.render and record:
        from safe_control_tpu.envs.warehouse_env import WarehouseEnv
        from safe_control_tpu.viz.plotting import Plotting

        env = WarehouseEnv(level=args.level, dt=ws.DT)
        obs7 = env.static_obs7
        plot = Plotting(env.width, env.height, obs7)
        ax, fig = plot.plot_grid(
            f"Warehouse level {args.level} ({args.algo}): {r['outcome']}"
        )
        plot.plot_waypoints(ax, env.get_nominal_waypoints())
        plot.plot_trajectory(ax, np.asarray(record))
        out = f"warehouse_l{args.level}_{args.algo}.png"
        fig.savefig(out, dpi=120)
        print(f"saved {out}")
    return 0 if safe else 1


if __name__ == "__main__":
    sys.exit(main())
