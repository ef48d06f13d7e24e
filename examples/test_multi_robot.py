"""Multi-robot fleet example (examples/test_multi_robot.py analog — but
batched: the reference steps robots one-by-one in a Python loop (:77-84);
here the whole fleet is one vmapped scan on device).

Usage: python examples/test_multi_robot.py --n 64
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=64, help="fleet size")
    parser.add_argument("--tf", type=float, default=60.0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from safe_control_tpu.core.spec import DOUBLE_INTEGRATOR_2D, make_spec
    from safe_control_tpu.core.types import pad_obstacles
    from safe_control_tpu.sim import tracking

    spec = make_spec(DOUBLE_INTEGRATOR_2D, v_max=1.0, a_max=1.5, radius=0.25)
    cfg = tracking.TrackerConfig(
        model_name=DOUBLE_INTEGRATOR_2D, pos_controller="cbf_qp", dt=0.05
    )
    known = pad_obstacles(
        jnp.asarray([[7.0, 7.0, 1.5, 0, 0, 0, 0], [4.0, 9.0, 0.8, 0, 0, 0, 0]]), 8
    )
    wps = jnp.asarray([[2.0, 2.0], [12.0, 12.0]], dtype=jnp.float32)

    # Fleet: ring of start positions around (2, 2).
    ang = np.linspace(0, 2 * np.pi, args.n, endpoint=False)
    x0s = jnp.asarray(
        np.column_stack(
            [2.0 + 1.5 * np.cos(ang), 2.0 + 1.5 * np.sin(ang), 0 * ang, 0 * ang]
        ),
        dtype=jnp.float32,
    )

    def sim(x0):
        st = tracking.init_state(cfg, spec, x0, 0.0, first_goal=wps[0])
        final, traj = tracking.run(
            cfg, spec, st, wps, jnp.asarray(2), known, int(args.tf / cfg.dt)
        )
        return final.ret, final.x

    rets, xs = jax.jit(jax.vmap(sim))(x0s)
    rets = np.asarray(rets)
    done = (rets == tracking.RET_DONE).sum()
    bad = (rets == tracking.RET_INFEASIBLE).sum()
    print(f"fleet {args.n}: {done} reached goal, {bad} infeasible/collision, "
          f"{args.n - done - bad} still tracking")
    print("Success!" if bad == 0 and done > args.n // 2 else "Failed!")


if __name__ == "__main__":
    main()
