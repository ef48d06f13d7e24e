"""Fused Pallas DU MPC kernel vs the XLA AL-GN path (interpreter mode).

The kernel reimplements mpc_cbf.solve's exact algorithm with hand-derived
Jacobians; on the CPU mesh it runs under the Pallas interpreter, so this is
a pure numerics comparison (measured on TPU: 244k solves/s vs 44k for the
XLA lowering — see PERF.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_tpu.core.spec import DYNAMIC_UNICYCLE_2D, make_spec
from safe_control_tpu.core.types import pad_obstacles
from safe_control_tpu.solvers import mpc_cbf
from safe_control_tpu.solvers import mpc_du_kernel as duk


def _problem_batch(B, horizon, rng_seed=0):
    spec = make_spec(DYNAMIC_UNICYCLE_2D, a_max=1.0, w_max=0.5)
    rng = np.random.default_rng(rng_seed)
    xs = jnp.asarray(
        np.concatenate(
            [rng.uniform(0, 3, (B, 2)), rng.uniform(-1, 1, (B, 1)),
             rng.uniform(0, 0.8, (B, 1))], axis=1,
        ), jnp.float32,
    )
    goals = jnp.tile(jnp.array([5.0, 1.0, 0.0, 0.0], jnp.float32), (B, 1))
    obs1 = pad_obstacles(
        jnp.asarray(
            [[2.5, 0.8, 0.4, 0, 0, 0, 0],
             [4.0, -0.4, 0.8, 0.4, 4.0, 0.4, 1.0]],  # superellipsoid row
            jnp.float32,
        ), 5,
    )
    obs = jnp.tile(obs1[None], (B, 1, 1))
    u_prevs = jnp.zeros((B, 2), jnp.float32)
    Uw = jnp.zeros((B, horizon, 2), jnp.float32)
    return spec, xs, goals, obs, u_prevs, Uw


@pytest.mark.slow
@pytest.mark.skipif(
    "SAFE_CONTROL_FULL_KERNEL_TEST" not in __import__("os").environ,
    reason="~30 min XLA-CPU compile of the full-size interpreter kernel; "
    "set SAFE_CONTROL_FULL_KERNEL_TEST=1 to run.  Last full run "
    "2026-08-21: PASSED.  Full-budget full-size numerics are "
    "also certified on real TPU every bench round by the built-in "
    "64-problem parity check (max_dev_vs_xla_u in BENCH_r*.json).",
)
def test_fused_kernel_full_size_geometry(monkeypatch):
    """The SHIPPED kernel geometry — N=8, M=16, K=5, the 16x16 Cholesky —
    against the XLA path, in interpreter mode.  Only the iteration budget
    is reduced (2x2 on both sides): interpret-mode cost scales with
    budget x unrolled-jaxpr size, and the 2x2 budget already executes every
    op of the full-size kernel (all 8 stages, all 50+16 constraint rows,
    the full Cholesky)."""
    monkeypatch.setattr(duk, "OUTER", 2)
    monkeypatch.setattr(duk, "NEWTON", 2)
    cfg = mpc_cbf.MPCConfig(horizon=8, num_obs=5, outer_iters=2,
                            newton_iters=2)
    dt = 0.05
    B = 8
    spec, xs, goals, obs, u_prevs, Uw = _problem_batch(B, 8)
    st0 = mpc_cbf.init_state(DYNAMIC_UNICYCLE_2D, cfg)

    def one(x, goal, ob, up, U):
        r = mpc_cbf.solve(
            DYNAMIC_UNICYCLE_2D, spec, x, goal, ob, up,
            mpc_cbf.MPCState(U=U, lam=jnp.zeros_like(st0.lam)), dt, cfg,
        )
        return r.u, r.viol

    u_ref, viol_ref = jax.jit(jax.vmap(one))(xs, goals, obs, u_prevs, Uw)

    params = (dt, float(spec.mpc_cbf_alpha1), float(spec.mpc_cbf_alpha2),
              float(spec.cbf_beta), float(spec.radius), float(spec.v_max),
              float(spec.a_max), float(spec.w_max))
    res = duk.solve_du_batch(xs, goals, obs, u_prevs, Uw, params,
                             interpret=True, b_tile=8)
    dev = np.max(np.abs(np.asarray(res.u) - np.asarray(u_ref)))
    assert dev < 5e-3, dev
    np.testing.assert_allclose(
        np.asarray(res.viol), np.asarray(viol_ref), atol=1e-3
    )


def test_solve_batch_dispatch():
    """``mpc_cbf.solve_batch`` is the public route to the kernel: the
    dispatch predicate accepts exactly the kernel's specialization, and the
    XLA fallback path equals the vmapped ``solve``."""
    cfg = mpc_cbf.MPCConfig(horizon=8, num_obs=5, use_fused_kernel=True)
    assert mpc_cbf.fused_kernel_available(DYNAMIC_UNICYCLE_2D, cfg)
    # any mismatch with the kernel's specialization falls back
    assert not mpc_cbf.fused_kernel_available(
        DYNAMIC_UNICYCLE_2D, cfg._replace(horizon=10))
    assert not mpc_cbf.fused_kernel_available(
        DYNAMIC_UNICYCLE_2D, cfg._replace(optimal_decay=True))
    assert not mpc_cbf.fused_kernel_available(
        DYNAMIC_UNICYCLE_2D, cfg._replace(polish_iters=2))
    assert not mpc_cbf.fused_kernel_available("DoubleIntegrator2D", cfg)

    # XLA fallback path == vmapped solve, bitwise
    cfg_x = mpc_cbf.MPCConfig(horizon=8, num_obs=5, outer_iters=2,
                              newton_iters=1)
    dt = 0.05
    B = 4
    spec, xs, goals, obs, u_prevs, Uw = _problem_batch(B, 8)
    st0 = mpc_cbf.init_state(DYNAMIC_UNICYCLE_2D, cfg_x)
    lam = jnp.tile(st0.lam[None], (B, 1))
    batch_state = mpc_cbf.MPCState(U=Uw, lam=lam)
    out = jax.jit(
        lambda s: mpc_cbf.solve_batch(
            DYNAMIC_UNICYCLE_2D, spec, xs, goals, obs, u_prevs, s, dt, cfg_x
        )
    )(batch_state)

    def one(x, goal, ob, up, U, lm):
        return mpc_cbf.solve(
            DYNAMIC_UNICYCLE_2D, spec, x, goal, ob, up,
            mpc_cbf.MPCState(U=U, lam=lm), dt, cfg_x,
        ).u

    u_ref = jax.jit(jax.vmap(one))(xs, goals, obs, u_prevs, Uw, lam)
    np.testing.assert_array_equal(np.asarray(out.u), np.asarray(u_ref))


@pytest.mark.slowslow  # per-round tier: shipped geometry checked on TPU by bench max_dev_vs_xla_u
@pytest.mark.slow
def test_fused_kernel_matches_xla_path(monkeypatch):
    # Reduced iteration budget: the interpreter replays every kernel op in
    # python, so the full 8x3 budget costs ~20 min; 2x1 exercises every
    # code path (rollout+Jacobians, AL update, line search, Cholesky) at
    # minimum replay cost.  Budgets must match on both sides.
    monkeypatch.setattr(duk, "OUTER", 2)
    monkeypatch.setattr(duk, "NEWTON", 1)
    # Shrink the kernel itself to N=4: interpret-mode cost is dominated by
    # XLA-CPU compile of the kernel jaxpr, which scales with the unrolled
    # horizon.  All derived sizes are module constants; patch consistently.
    monkeypatch.setattr(duk, "N", 4)
    monkeypatch.setattr(duk, "M", 8)
    monkeypatch.setattr(duk, "NR", 4 * 4 + 2 * 4)
    monkeypatch.setattr(duk, "NC", 4 * duk.K + 2 * 4)
    spec = make_spec(DYNAMIC_UNICYCLE_2D, a_max=1.0, w_max=0.5)
    cfg = mpc_cbf.MPCConfig(horizon=4, num_obs=5, outer_iters=2,
                            newton_iters=1)
    dt = 0.05
    rng = np.random.default_rng(0)
    B = 8
    xs = jnp.asarray(
        np.concatenate(
            [rng.uniform(0, 3, (B, 2)), rng.uniform(-1, 1, (B, 1)),
             rng.uniform(0, 0.8, (B, 1))], axis=1,
        ), jnp.float32,
    )
    goals = jnp.tile(jnp.array([5.0, 1.0, 0.0, 0.0], jnp.float32), (B, 1))
    obs1 = pad_obstacles(
        jnp.asarray(
            [[2.5, 0.8, 0.4, 0, 0, 0, 0],
             [4.0, -0.4, 0.8, 0.4, 4.0, 0.4, 1.0]],  # superellipsoid row
            jnp.float32,
        ), 5,
    )
    obs = jnp.tile(obs1[None], (B, 1, 1))
    u_prevs = jnp.zeros((B, 2), jnp.float32)
    Uw = jnp.zeros((B, 4, 2), jnp.float32)

    st0 = mpc_cbf.init_state(DYNAMIC_UNICYCLE_2D, cfg)

    def one(x, goal, ob, up, U):
        r = mpc_cbf.solve(
            DYNAMIC_UNICYCLE_2D, spec, x, goal, ob, up,
            mpc_cbf.MPCState(U=U, lam=jnp.zeros_like(st0.lam)), dt, cfg,
        )
        return r.u, r.viol

    u_ref, viol_ref = jax.jit(jax.vmap(one))(xs, goals, obs, u_prevs, Uw)

    params = (dt, float(spec.mpc_cbf_alpha1), float(spec.mpc_cbf_alpha2),
              float(spec.cbf_beta), float(spec.radius), float(spec.v_max),
              float(spec.a_max), float(spec.w_max))
    res = duk.solve_du_batch(xs, goals, obs, u_prevs, Uw, params,
                             interpret=True, b_tile=8)
    dev = np.max(np.abs(np.asarray(res.u) - np.asarray(u_ref)))
    # identical algorithm, different op ordering: agreement to f32
    # noise-floor level (see PERF.md precision accounting)
    assert dev < 5e-3, dev
    # feasibility verdicts agree
    np.testing.assert_allclose(
        np.asarray(res.viol), np.asarray(viol_ref), atol=1e-3
    )
