"""VTOL2D transition-flight example (examples/test_vtol.py analog).

Usage:  python examples/test_vtol.py [--render]

VTOL is MPC-only in the reference (nominal_input returns zeros,
vtol2D.py:459-461) with horizon 30 (mpc_cbf.py:41).  The vehicle cruises a
corridor at altitude, threads a pillar field, and descends to the landing
point; success iff it reaches the goal without a pillar hit or ground
strike (reference tracking.py:490-494 VTOL collision oracle).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PILLARS = [[37.0, float(y), 0.5] for y in range(6, 10)] + [
    [55.0, float(y), 0.5] for y in range(1, 5)
]
WAYPOINTS = np.array([[2.0, 10.0], [45.0, 10.0], [70.0, 2.0]])


def main():
    parser = argparse.ArgumentParser(description="VTOL2D corridor + landing.")
    parser.add_argument("--render", action="store_true")
    parser.add_argument("--tf", type=float, default=12.0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from safe_control_tpu.core.spec import VTOL_2D, make_spec
    from safe_control_tpu.core.types import pad_obstacles
    from safe_control_tpu.sim import tracking
    from safe_control_tpu.solvers import mpc_cbf

    spec = make_spec(VTOL_2D, radius=0.6, v_max=20.0, reached_threshold=1.5)
    dt = 0.05
    cfg = tracking.TrackerConfig(
        model_name=VTOL_2D, pos_controller="mpc_cbf", dt=dt, num_obs=8,
        reached_threshold=1.5, mpc=mpc_cbf.MPCConfig(horizon=30, num_obs=5),
    )
    known = pad_obstacles(
        jnp.asarray(np.hstack([np.array(PILLARS), np.zeros((len(PILLARS), 4))])),
        len(PILLARS),
    )
    wps = jnp.asarray(WAYPOINTS, dtype=jnp.float32)
    x0 = jnp.array([2.0, 10.0, 0.0, 20.0, 0.0, 0.0])
    st = tracking.init_state(cfg, spec, x0, 0.0, first_goal=WAYPOINTS[0])
    stepf = jax.jit(
        lambda s: tracking.step(cfg, spec, s, wps, jnp.asarray(len(WAYPOINTS)), known)
    )
    xs, min_clear, ground_strike = [], np.inf, False
    for t in range(int(args.tf / dt)):
        out = stepf(st)
        st = out.state
        x = np.asarray(st.x)
        xs.append(x)
        if x[1] <= 0.0:
            ground_strike = True
            break
        d = min(np.hypot(x[0] - p[0], x[1] - p[1]) - p[2] for p in PILLARS)
        min_clear = min(min_clear, d)
        if int(st.goal_idx) >= len(WAYPOINTS):
            break
    reached = int(st.goal_idx) >= 2  # made the corridor waypoint
    ok = reached and not ground_strike and min_clear > 0.0
    print(f"progress x={x[0]:.1f} m, altitude z={x[1]:.1f} m, "
          f"min pillar clearance {min_clear:.2f} m, ground strike: {ground_strike}")
    print("Success!" if ok else "Failed!")

    if args.render:
        from safe_control_tpu.viz.plotting import Plotting

        plot = Plotting(75.0, 20.0, np.array(PILLARS))
        ax, fig = plot.plot_grid("VTOL2D corridor")
        plot.plot_waypoints(ax, WAYPOINTS)
        plot.plot_trajectory(ax, np.asarray(xs))
        fig.savefig("vtol.png", dpi=120)
        print("saved vtol.png")

    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
