"""QP solver unit tests: KKT residuals and known solutions (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_tpu.solvers.qp import solve_qp


def _random_feasible_qp(key, n=4, m=8):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    L = jax.random.normal(k1, (n, n))
    P = L @ L.T + 0.5 * jnp.eye(n)
    q = jax.random.normal(k2, (n,))
    A = jax.random.normal(k3, (m, n))
    x_feas = jax.random.normal(k4, (n,)) * 0.3
    margin = 1.0
    l = A @ x_feas - margin
    u = A @ x_feas + margin
    return P, q, A, l, u


def test_unconstrained_matches_newton():
    key = jax.random.PRNGKey(0)
    P, q, _, _, _ = _random_feasible_qp(key)
    A = jnp.eye(4)
    l = jnp.full((4,), -jnp.inf)
    u = jnp.full((4,), jnp.inf)
    sol = solve_qp(P, q, A, l, u, iters=200)
    expected = -jnp.linalg.solve(P, q)
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(expected), atol=1e-4)


def test_projection_onto_box():
    # min ||x - c||^2 s.t. -1 <= x <= 1  => clip(c, -1, 1)
    c = jnp.array([2.0, -3.0, 0.5, 0.0])
    P = 2.0 * jnp.eye(4)
    q = -2.0 * c
    A = jnp.eye(4)
    l = -jnp.ones(4)
    u = jnp.ones(4)
    sol = solve_qp(P, q, A, l, u, iters=100)
    np.testing.assert_allclose(
        np.asarray(sol.x), np.clip(np.asarray(c), -1, 1), atol=1e-5
    )


def test_active_inequality():
    # min ||u - ur||^2 s.t. a'u + b >= 0 with ur violating the constraint.
    # Analytic: u* = ur + a * max(0, -(a'ur + b)) / ||a||^2
    ur = jnp.array([1.0, 0.0])
    a = jnp.array([1.0, 1.0])
    b = -3.0  # a'ur + b = -2 < 0 -> active
    P = 2.0 * jnp.eye(2)
    q = -2.0 * ur
    A = a[None, :]
    l = jnp.array([-b])
    u = jnp.array([jnp.inf])
    sol = solve_qp(P, q, A, l, u, iters=100)
    lam = -(a @ ur + b) / (a @ a)
    expected = ur + a * lam
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(expected), atol=1e-5)


def test_kkt_residuals_random_batch():
    keys = jax.random.split(jax.random.PRNGKey(42), 64)
    Ps, qs, As, ls, us = jax.vmap(_random_feasible_qp)(keys)
    sols = jax.vmap(lambda *a: solve_qp(*a, iters=150))(Ps, qs, As, ls, us)
    assert np.asarray(sols.prim_res).max() < 1e-4
    assert np.asarray(sols.dual_res).max() < 1e-3


def test_cbfqp_shape_problem():
    # Typical CBF-QP shape: 2 vars, 10 CBF rows (some inert/padded) + box.
    rng = np.random.default_rng(7)
    ur = jnp.array(rng.normal(size=2), dtype=jnp.float32)
    Acbf = np.zeros((10, 2), dtype=np.float32)
    bcbf = np.zeros(10, dtype=np.float32)
    Acbf[:3] = rng.normal(size=(3, 2))
    bcbf[:3] = rng.normal(size=3) * 0.1
    P = 2.0 * jnp.eye(2)
    q = -2.0 * ur
    A = jnp.concatenate([jnp.asarray(Acbf), jnp.eye(2)], axis=0)
    l = jnp.concatenate([jnp.asarray(-bcbf), jnp.array([-0.5, -0.5])])
    # Padded zero rows must be inert: l=-0 works since 0@x=0>=0.
    u = jnp.concatenate([jnp.full((10,), jnp.inf), jnp.array([0.5, 0.5])])
    sol = solve_qp(P, q, A, l, u, iters=150)
    assert sol.prim_res < 1e-5
    # Complementary slackness & stationarity
    assert sol.dual_res < 1e-4


@pytest.mark.parametrize("n,m", [(2, 12), (16, 72)])
def test_jit_and_vmap_compile(n, m):
    key = jax.random.PRNGKey(1)
    keys = jax.random.split(key, 8)
    Ps, qs, As, ls, us = jax.vmap(
        lambda k: _random_feasible_qp(k, n=n, m=m)
    )(keys)
    f = jax.jit(jax.vmap(lambda *a: solve_qp(*a, iters=80).x))
    out = f(Ps, qs, As, ls, us)
    assert out.shape == (8, n)
    assert np.isfinite(np.asarray(out)).all()
