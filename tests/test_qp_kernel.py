"""Pallas QP kernel: parity with the XLA ADMM path (interpreter mode on CPU).

The kernel implements the exact same math as solvers/qp.py (equilibration,
staged adaptive-rho ADMM, active-set polish), so on well-posed problems the
two must agree to solver tolerance, and both must agree with the analytic
solution on problems small enough to solve by hand.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_tpu.solvers.qp import solve_qp
from safe_control_tpu.solvers.qp_kernel import solve_qp_batch_pallas


def _random_qps(seed, B, n, m, one_sided=3):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(B, n, n))
    P = M @ M.transpose(0, 2, 1) + np.eye(n)
    q = rng.normal(size=(B, n))
    A = rng.normal(size=(B, m, n))
    c = rng.normal(size=(B, m))
    l = c - rng.uniform(0.1, 2.0, size=(B, m))
    u = c + rng.uniform(0.1, 2.0, size=(B, m))
    u[:, :one_sided] = np.inf  # CBF-style one-sided rows
    to = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return to(P), to(q), to(A), to(l), to(u)


@pytest.mark.slow
def test_matches_xla_path():
    P, q, A, l, u = _random_qps(0, 8, 3, 10)
    ref = jax.vmap(lambda *a: solve_qp(*a, iters=300))(P, q, A, l, u)
    got = solve_qp_batch_pallas(P, q, A, l, u, iters=300)
    # Compare only problems both paths solved (random QPs can be infeasible).
    ok = np.asarray(ref.prim_res < 1e-4) & np.asarray(got.prim_res < 1e-4)
    assert ok.sum() >= 4
    dx = np.max(np.abs(np.asarray(ref.x - got.x)[ok]))
    assert dx < 1e-3, dx


def test_analytic_projection():
    # min ||x - t||^2 s.t. x in [-1, 1]^2  => clamp(t).
    B = 4
    t = jnp.asarray([[2.0, 0.3], [-3.0, 0.0], [0.5, -0.2], [9.0, -9.0]])
    P = jnp.tile(2.0 * jnp.eye(2)[None], (B, 1, 1))
    q = -2.0 * t
    A = jnp.tile(jnp.eye(2)[None], (B, 1, 1))
    l = -jnp.ones((B, 2))
    u = jnp.ones((B, 2))
    sol = solve_qp_batch_pallas(P, q, A, l, u, iters=200)
    np.testing.assert_allclose(
        np.asarray(sol.x), np.clip(np.asarray(t), -1, 1), atol=1e-5
    )


def test_active_inequality_kkt():
    # min ||u||^2 s.t. a'u >= b with b > 0: solution u = a b / ||a||^2.
    a = jnp.asarray([[1.0, 2.0]])
    b = 3.0
    P = 2.0 * jnp.eye(2)[None]
    q = jnp.zeros((1, 2))
    A = a[:, None, :]
    l = jnp.full((1, 1), b)
    u = jnp.full((1, 1), jnp.inf)
    sol = solve_qp_batch_pallas(P, q, A, l, u, iters=300)
    expect = np.asarray(a[0]) * b / float(a[0] @ a[0])
    np.testing.assert_allclose(np.asarray(sol.x[0]), expect, atol=1e-5)
    assert float(sol.prim_res[0]) < 1e-5


@pytest.mark.slow
def test_non_tile_multiple_batch():
    # Batch not a multiple of 128 exercises the padding path.
    P, q, A, l, u = _random_qps(1, 5, 2, 6, one_sided=1)
    ref = jax.vmap(lambda *a: solve_qp(*a, iters=300))(P, q, A, l, u)
    got = solve_qp_batch_pallas(P, q, A, l, u, iters=300)
    ok = np.asarray(ref.prim_res < 1e-4) & np.asarray(got.prim_res < 1e-4)
    dx = np.max(np.abs(np.asarray(ref.x - got.x)[ok]))
    assert dx < 1e-3


@pytest.mark.slowslow  # per-round tier: QP kernel covered by test_matches_xla_path in the default run
@pytest.mark.slow
def test_manipulator_scale_row_count():
    # The Manipulator2D CBF-QP reaches ~150 rows (reference tracking.py:
    # 134-138).  The row-aware tile (qp_kernel._tile_for) must shrink the
    # lane count so the kernel still matches the XLA path at m=153.
    from safe_control_tpu.solvers.qp_kernel import _tile_for

    assert _tile_for(3, 153, 4096) < 1024  # tile actually shrinks
    # Feasible-by-construction: bounds bracket A @ x_star (153 random rows in
    # R^3 would otherwise be jointly infeasible almost surely).
    rng = np.random.default_rng(7)
    B, n, m = 4, 3, 153  # 4 problems: interpret cost is linear in B
    M = rng.normal(size=(B, n, n))
    P = M @ M.transpose(0, 2, 1) + np.eye(n)
    q = rng.normal(size=(B, n))
    A = rng.normal(size=(B, m, n))
    x_star = rng.normal(size=(B, n))
    Ax = np.einsum("bmn,bn->bm", A, x_star)
    l = Ax - rng.uniform(0.05, 1.5, size=(B, m))
    u = Ax + rng.uniform(0.05, 1.5, size=(B, m))
    u[:, :100] = np.inf  # CBF-style one-sided rows
    to = lambda z: jnp.asarray(z, dtype=jnp.float32)
    P, q, A, l, u = to(P), to(q), to(A), to(l), to(u)
    ref = jax.vmap(lambda *a: solve_qp(*a, iters=300))(P, q, A, l, u)
    got = solve_qp_batch_pallas(P, q, A, l, u, iters=300)
    ok = np.asarray(ref.prim_res < 1e-4) & np.asarray(got.prim_res < 1e-4)
    assert ok.sum() >= 2
    dx = np.max(np.abs(np.asarray(ref.x - got.x)[ok]))
    assert dx < 2e-3, dx


@pytest.mark.slowslow  # per-round tier: QP kernel covered by test_cbf_qp_pallas_backend_matches_xla
@pytest.mark.slow
def test_manipulator_cbf_qp_pallas_backend():
    # End-to-end: the real Manipulator2D link-circle CBF-QP (n=3 joint
    # velocities, 5 obstacles x link-circle rows) through the Pallas backend.
    from safe_control_tpu.core.spec import MANIPULATOR_2D, make_spec
    from safe_control_tpu.core.types import pad_obstacles
    from safe_control_tpu.solvers import cbf_qp

    spec = make_spec(MANIPULATOR_2D)
    rng = np.random.default_rng(3)
    B = 4
    xs = jnp.asarray(rng.uniform(-1.0, 1.0, (B, 3)), dtype=jnp.float32)
    u_refs = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 3)), dtype=jnp.float32)
    obs_one = pad_obstacles(
        jnp.asarray(
            [[1.5, 1.5, 0.3, 0, 0, 0, 0], [-1.0, 2.0, 0.4, 0, 0, 0, 0]],
            dtype=jnp.float32,
        ),
        5,
    )
    obs = jnp.tile(obs_one[None], (B, 1, 1))
    # 800 ADMM iterations (default 1600): both backends run the same
    # count, and these well-conditioned 3-var problems converge far
    # earlier — the interpret-mode iteration replay is the suite cost.
    r_x = cbf_qp.solve_batch(
        MANIPULATOR_2D, spec, xs, u_refs, obs, 0.05, backend="xla", iters=600
    )
    r_p = cbf_qp.solve_batch(
        MANIPULATOR_2D, spec, xs, u_refs, obs, 0.05, backend="pallas",
        iters=600
    )
    np.testing.assert_allclose(np.asarray(r_x.u), np.asarray(r_p.u), atol=2e-3)


def test_cbf_qp_pallas_backend_matches_xla():
    from safe_control_tpu.core.spec import DYNAMIC_UNICYCLE_2D, make_spec
    from safe_control_tpu.core.types import pad_obstacles
    from safe_control_tpu.solvers import cbf_qp

    spec = make_spec(DYNAMIC_UNICYCLE_2D, a_max=1.0, w_max=0.5)
    rng = np.random.default_rng(2)
    B = 6
    xs = jnp.asarray(
        np.concatenate(
            [
                rng.uniform(0, 3, (B, 2)),
                rng.uniform(-1, 1, (B, 1)),
                rng.uniform(0.1, 0.6, (B, 1)),
            ],
            axis=1,
        ),
        dtype=jnp.float32,
    )
    u_refs = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 2)), dtype=jnp.float32)
    obs_one = pad_obstacles(
        jnp.asarray([[2.0, 2.0, 0.5, 0, 0, 0, 0]], dtype=jnp.float32), 5
    )
    obs = jnp.tile(obs_one[None], (B, 1, 1))
    r_x = cbf_qp.solve_batch(
        DYNAMIC_UNICYCLE_2D, spec, xs, u_refs, obs, 0.05, backend="xla"
    )
    r_p = cbf_qp.solve_batch(
        DYNAMIC_UNICYCLE_2D, spec, xs, u_refs, obs, 0.05, backend="pallas"
    )
    np.testing.assert_allclose(
        np.asarray(r_x.u), np.asarray(r_p.u), atol=2e-3
    )
    np.testing.assert_array_equal(
        np.asarray(r_x.feasible), np.asarray(r_p.feasible)
    )
