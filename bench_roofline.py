"""Roofline measurement for the MPC-CBF solve (BASELINE north-star op).

For each configuration, lowers + compiles the batched solve, reads XLA's own
cost analysis (FLOPs + HBM bytes accessed), times steady-state execution,
and reports achieved FLOP/s, achieved bandwidth, and arithmetic intensity.
This is the "prove" side of the large-horizon item: it shows WHERE each
configuration sits on the roofline — the small-model MPC solve is
bandwidth/occupancy-bound, not MXU-bound, so a denser factorization cannot
buy another order of magnitude; scaling comes from batch (more lanes), not
from per-solve FLOP reduction.

Prints one JSON line per config.  Run on the real TPU (single process).
"""

from __future__ import annotations

import json
import time

import numpy as np

# v5e single-chip peaks (public spec): ~197 TFLOP/s bf16, ~98 TFLOP/s f32
# (MXU), ~819 GB/s HBM BW.
PEAK_F32_FLOPS = 9.8e13
PEAK_HBM_BPS = 8.19e11


def measure(model_name, horizon, batch, spec_kwargs, n_ctrl, reps=5):
    import jax
    import jax.numpy as jnp

    from safe_control_tpu.core.spec import make_spec
    from safe_control_tpu.core.types import pad_obstacles
    from safe_control_tpu.dynamics import get_model
    from safe_control_tpu.solvers import mpc_cbf

    spec = make_spec(model_name, **spec_kwargs)
    model = get_model(model_name)
    cfg = mpc_cbf.MPCConfig(horizon=horizon, num_obs=5)
    dt = 0.05
    n = model.N_STATES
    goal = jnp.zeros((n,), jnp.float32).at[0].set(5.0)
    obs = pad_obstacles(
        jnp.asarray([[3.0, 0.5, 0.4, 0, 0, 0, 0]], jnp.float32), 5
    )
    st0 = mpc_cbf.init_state(model_name, cfg)

    def one(x, U):
        res = mpc_cbf.solve(
            model_name, spec, x, goal, obs, jnp.zeros(n_ctrl),
            mpc_cbf.MPCState(U=U, lam=jnp.zeros_like(st0.lam)), dt, cfg,
        )
        return res.u, res.state.U

    fn = jax.jit(jax.vmap(one))
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.uniform(-0.3, 0.8, (batch, n)), jnp.float32)
    Us = jnp.tile(st0.U[None], (batch, 1, 1))

    lowered = fn.lower(xs, Us)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))

    u, Us_w = fn(xs, Us)
    _ = np.asarray(u[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        u, Us_w = fn(xs, Us_w)
    _ = np.asarray(u[:1, :1])
    dt_wall = (time.perf_counter() - t0) / reps

    achieved_flops = flops / dt_wall
    achieved_bw = bytes_acc / dt_wall
    return {
        "metric": "mpc_cbf_roofline",
        "model": model_name,
        "horizon": horizon,
        "batch": batch,
        "decision_vars": horizon * n_ctrl,
        "solves_per_sec": round(batch / dt_wall, 1),
        "xla_flops_per_solve": round(flops / batch, 1),
        "xla_bytes_per_solve": round(bytes_acc / batch, 1),
        "achieved_tflops": round(achieved_flops / 1e12, 4),
        "pct_of_f32_peak": round(100 * achieved_flops / PEAK_F32_FLOPS, 2),
        "achieved_gbps": round(achieved_bw / 1e9, 2),
        "pct_of_hbm_peak": round(100 * achieved_bw / PEAK_HBM_BPS, 2),
        "arithmetic_intensity": round(flops / max(bytes_acc, 1.0), 3),
    }


def main():
    from safe_control_tpu.core.spec import DYNAMIC_UNICYCLE_2D, VTOL_2D

    cases = [
        (DYNAMIC_UNICYCLE_2D, 8, 4096, dict(a_max=1.0, w_max=0.5), 2),
        (DYNAMIC_UNICYCLE_2D, 25, 1024, dict(a_max=1.0, w_max=0.5), 2),
        (VTOL_2D, 30, 256, dict(), 4),
    ]
    for model_name, horizon, batch, kw, n_ctrl in cases:
        try:
            print(json.dumps(measure(model_name, horizon, batch, kw, n_ctrl)))
        except Exception as e:
            print(json.dumps({"metric": "mpc_cbf_roofline", "model": model_name,
                              "horizon": horizon,
                              "error": f"{type(e).__name__}: {e}"}))


if __name__ == "__main__":
    main()
