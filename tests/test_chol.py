"""Tiered SPD solve (solvers/chol.py) + large-horizon MPC path tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_tpu.core.spec import DYNAMIC_UNICYCLE_2D, make_spec
from safe_control_tpu.core.types import pad_obstacles
from safe_control_tpu.solvers import mpc_cbf
from safe_control_tpu.solvers.chol import (
    _chol_factor,
    _chol_solve_blocked,
    _chol_solve_unrolled,
    _chol_sub,
)


def _spd(D, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((D, D))
    return A @ A.T + D * np.eye(D), rng.standard_normal(D)


def test_blocked_solve_matches_dense():
    for D in (17, 40, 64, 120, 160):
        H, g = _spd(D, seed=D)
        x = np.asarray(
            _chol_solve_blocked(jnp.asarray(H, jnp.float32), jnp.asarray(g, jnp.float32))
        )
        ref = np.linalg.solve(H, g)
        assert np.max(np.abs(x - ref)) < 1e-3 * max(1.0, np.max(np.abs(ref))), D


def test_unrolled_solve_matches_dense():
    for D in (3, 16, 40):
        H, g = _spd(D, seed=D + 1)
        x = np.asarray(
            _chol_solve_unrolled(jnp.asarray(H, jnp.float32), jnp.asarray(g, jnp.float32))
        )
        ref = np.linalg.solve(H, g)
        assert np.max(np.abs(x - ref)) < 1e-3 * max(1.0, np.max(np.abs(ref))), D


def test_factor_sub_many_rhs():
    D = 56
    H, _ = _spd(D, seed=7)
    B = np.random.default_rng(1).standard_normal((D, 5))
    L = _chol_factor(jnp.asarray(H, jnp.float32))
    X = jax.vmap(lambda col: _chol_sub(L, col), in_axes=1, out_axes=1)(
        jnp.asarray(B, jnp.float32)
    )
    ref = np.linalg.solve(H, B)
    assert np.max(np.abs(np.asarray(X) - ref)) < 1e-3 * np.max(np.abs(ref))


@pytest.mark.slow
def test_mpc_cbf_blocked_path_solves():
    """Horizon 25 x 2 controls = 50 decision vars: exercises the blocked
    Newton solve (between _UNROLL_CHOL_MAX=40 and _BLOCKED_CHOL_MAX)."""
    spec = make_spec(DYNAMIC_UNICYCLE_2D, a_max=1.0, w_max=0.5)
    cfg = mpc_cbf.MPCConfig(horizon=25, num_obs=3)
    obs = pad_obstacles(
        jnp.asarray([[2.0, 0.2, 0.35, 0, 0, 0, 0]], jnp.float32), 3
    )
    x = jnp.array([0.0, 0.0, 0.0, 0.4], jnp.float32)
    goal = jnp.array([5.0, 0.5, 0.0, 0.0], jnp.float32)
    st = mpc_cbf.init_state(DYNAMIC_UNICYCLE_2D, cfg)
    r = jax.jit(
        lambda x: mpc_cbf.solve(
            DYNAMIC_UNICYCLE_2D, spec, x, goal, obs, jnp.zeros(2), st, 0.05, cfg
        )
    )(x)
    assert np.isfinite(np.asarray(r.u)).all()
    assert float(r.viol) < 0.05, float(r.viol)
    # the plan must actually head toward the goal
    assert float(r.xs[-1, 0]) > 1.0
