"""Discrete-time MPC-CBF as a batched augmented-Lagrangian Gauss-Newton solve.

Behavioral equivalent of /root/reference/position_control/mpc_cbf.py, which
builds a do-mpc/CasADi NLP solved by IPOPT every control step:

- horizon N (``mpc_horizon``, default 10; :15)
- Euler-discretized dynamics x_{k+1} = x_k + (f + g u) dt in the graph (:134-141)
- cost  sum_{k=1..N} (x_k-goal)' Q (x_k-goal)  +  sum_k du_k' R du_k
  (lterm+mterm :176-178, rterm on input moves :180)
- per-stage input/state bounds (:183-232)
- dt-CBF constraint per obstacle per stage (:295-325), obstacles padded with
  dummies at (1000,1000) to a fixed count (:338-364)

TPU-native architecture instead of a NLP handoff: the decision variable is the
control trajectory U (N, m); states come from a ``lax.scan`` rollout;
inequality constraints (CBF + state bounds) are handled by an augmented
Lagrangian; each outer iteration runs projected Gauss-Newton steps with a
branch-free parallel backtracking line search.  Everything is fixed-shape and
fixed-iteration, so one ``vmap`` runs thousands of robots per chip and the
whole solver jit-compiles into a single XLA program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from safe_control_tpu.barriers.hocbf import dt_hocbf_value
from safe_control_tpu.core import spec as spec_mod
from safe_control_tpu.dynamics import get_model


# Per-model cost weights (mpc_cbf.py:19-43).
_WEIGHTS = {
    spec_mod.SINGLE_INTEGRATOR_2D: ([50.0, 50.0], [5.0, 5.0]),
    spec_mod.UNICYCLE_2D: ([50.0, 50.0, 0.01], [0.5, 0.5]),
    spec_mod.DYNAMIC_UNICYCLE_2D: ([50.0, 50.0, 0.01, 30.0], [0.5, 0.5]),
    spec_mod.DOUBLE_INTEGRATOR_2D: ([50.0, 50.0, 20.0, 20.0], [0.5, 0.5]),
    spec_mod.KINEMATIC_BICYCLE_2D: ([50.0, 50.0, 1.0, 1.0], [0.5, 5000.0]),
    spec_mod.KINEMATIC_BICYCLE_2D_C3BF: ([50.0, 50.0, 1.0, 1.0], [0.5, 5000.0]),
    spec_mod.KINEMATIC_BICYCLE_2D_DPCBF: ([50.0, 50.0, 1.0, 1.0], [0.5, 5000.0]),
    spec_mod.QUAD_2D: ([25.0, 25.0, 50.0, 10.0, 10.0, 50.0], [0.5, 0.5]),
    spec_mod.QUAD_3D: (
        [30.0, 30.0, 5.0, 20.0, 20.0, 1.0, 10.0, 10.0, 10.0, 20.0, 20.0, 1.0],
        [1.0, 1.0, 1.0, 1.0],
    ),
    spec_mod.VTOL_2D: ([10.0, 10.0, 250.0, 10.0, 10.0, 50.0], [0.5, 0.5, 0.5, 50000.0]),
}


def mpc_weights(model_name: str):
    q, r = _WEIGHTS[model_name]
    return jnp.asarray(q), jnp.asarray(r)


class MPCConfig(NamedTuple):
    horizon: int = 10
    num_obs: int = 5
    outer_iters: int = 12  # augmented-Lagrangian multiplier updates
    newton_iters: int = 4  # Gauss-Newton steps per outer iteration
    rho0: float = 10.0  # initial AL penalty
    rho_growth: float = 1.6
    reg: float = 1e-6  # Levenberg damping
    viol_tol: float = 1e-4


class MPCState(NamedTuple):
    """Warm-start state carried across control steps."""

    U: jnp.ndarray  # (N, m) control trajectory
    lam: jnp.ndarray  # (n_con,) AL multipliers


class MPCResult(NamedTuple):
    u: jnp.ndarray  # (m,) first control
    state: MPCState  # shifted warm start for the next step
    xs: jnp.ndarray  # (N+1, n) predicted states incl. x0
    feasible: jnp.ndarray  # bool scalar
    viol: jnp.ndarray  # max constraint violation


def init_state(model_name: str, cfg: MPCConfig, dtype=jnp.float32) -> MPCState:
    model = get_model(model_name)
    n_con = _num_constraints(model, cfg)
    return MPCState(
        U=jnp.zeros((cfg.horizon, model.N_CONTROLS), dtype=dtype),
        lam=jnp.zeros((n_con,), dtype=dtype),
    )


def _num_constraints(model, cfg: MPCConfig) -> int:
    n_bounded = int(_bounded_mask(model).sum())
    return cfg.horizon * cfg.num_obs + 2 * cfg.horizon * n_bounded


def _bounded_mask(model):
    import numpy as np

    lb, ub = model.state_bounds(_DUMMY_SPEC_CACHE.setdefault(
        model, spec_mod.make_spec(_model_name_of(model))))
    return np.isfinite(np.asarray(lb)) | np.isfinite(np.asarray(ub))


_DUMMY_SPEC_CACHE: dict = {}


def _model_name_of(model) -> str:
    from safe_control_tpu.dynamics.base import MODEL_REGISTRY

    for name, mod in MODEL_REGISTRY.items():
        if mod is model:
            return name
    raise ValueError("unregistered model module")


def solve(
    model_name: str,
    spec,
    x0,
    goal,
    obs,
    u_prev,
    mpc_state: MPCState,
    dt: float,
    cfg: MPCConfig = MPCConfig(),
) -> MPCResult:
    """One MPC-CBF solve for a single robot (vmap for batches).

    ``goal`` is (n,)-padded like the reference's tvp goal (mpc_cbf.py:267);
    ``obs`` is the fixed-shape (num_obs, 7) padded obstacle array.
    """
    model = get_model(model_name)
    N, m, n = cfg.horizon, model.N_CONTROLS, model.N_STATES
    dtype = x0.dtype
    Qd, Rd = mpc_weights(model_name)
    Qs = jnp.sqrt(Qd).astype(dtype)
    Rs = jnp.sqrt(Rd).astype(dtype)
    lb_u, ub_u = model.u_lb(spec), model.u_ub(spec)
    lb_x, ub_x = model.state_bounds(spec)

    import numpy as np

    bounded = np.asarray(_bounded_mask(model))
    bounded_idx = tuple(int(i) for i in np.nonzero(bounded)[0])

    def rollout(U):
        def step_fn(x, u):
            x1 = model.step(x, u, spec, dt)
            return x1, x1

        _, xs = jax.lax.scan(step_fn, x0, U)
        return xs  # (N, n): x_1..x_N

    def residual(U):
        xs = rollout(U)
        state_res = (xs - goal[None, :]) * Qs[None, :]
        du = jnp.diff(jnp.concatenate([u_prev[None, :], U], axis=0), axis=0)
        input_res = du * Rs[None, :]
        return jnp.concatenate([state_res.ravel(), input_res.ravel()])

    def constraints(U):
        """All inequality constraints c(U) >= 0, fixed shape."""
        xs = rollout(U)
        xs_full = jnp.concatenate([x0[None, :], xs], axis=0)  # (N+1, n)
        # CBF at stages k=0..N-1 with (x_k, u_k) per obstacle.
        cbf = jax.vmap(
            lambda xk, uk: jax.vmap(
                lambda o: dt_hocbf_value(model, model_name, xk, uk, o, spec, dt)
            )(obs)
        )(xs_full[:N], U)  # (N, K)
        cons = [cbf.ravel()]
        for i in bounded_idx:
            cons.append(ub_x[i] - xs[:, i])  # upper
            cons.append(xs[:, i] - lb_x[i])  # lower
        return jnp.concatenate(cons)

    def al_value_grad(U_flat, lam, rho):
        def L(Uf):
            U = Uf.reshape(N, m)
            r = residual(U)
            c = constraints(U)
            # AL for c >= 0:  (1/(2rho)) * (max(0, lam - rho c)^2 - lam^2)
            act = jnp.maximum(0.0, lam - rho * c)
            return r @ r + (act @ act - lam @ lam) / (2.0 * rho)

        return jax.value_and_grad(L)(U_flat)

    def gn_hessian(U_flat, lam, rho):
        U = U_flat.reshape(N, m)
        Jr = jax.jacfwd(lambda Uf: residual(Uf.reshape(N, m)))(U_flat)
        c = constraints(U)
        Jc = jax.jacfwd(lambda Uf: constraints(Uf.reshape(N, m)))(U_flat)
        act = (lam - rho * c) > 0.0
        H = 2.0 * Jr.T @ Jr + rho * (Jc.T * act[None, :].astype(dtype)) @ Jc
        return H

    lb_flat = jnp.tile(lb_u, N)
    ub_flat = jnp.tile(ub_u, N)

    # Scan-based warm start: shift previous U by one stage (standard MPC).
    U0 = jnp.concatenate([mpc_state.U[1:], mpc_state.U[-1:]], axis=0)
    U0 = jnp.clip(U0, lb_u[None, :], ub_u[None, :])
    Uf = U0.ravel()
    lam = mpc_state.lam

    alphas = jnp.array([1.0, 0.5, 0.25, 0.1, 0.03, 0.0], dtype=dtype)

    def newton_step(Uf, lam, rho):
        val, grad = al_value_grad(Uf, lam, rho)
        H = gn_hessian(Uf, lam, rho)
        H = H + cfg.reg * jnp.eye(N * m, dtype=dtype) * (1.0 + jnp.trace(H) / (N * m))
        step = -jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(H, lower=True), grad
        )

        def merit(a):
            cand = jnp.clip(Uf + a * step, lb_flat, ub_flat)
            v, _ = al_value_grad(cand, lam, rho)
            return v

        vals = jax.vmap(merit)(alphas)
        vals = jnp.where(jnp.isfinite(vals), vals, jnp.inf)
        best = jnp.argmin(vals)
        return jnp.clip(Uf + alphas[best] * step, lb_flat, ub_flat)

    def outer_body(i, carry):
        Uf, lam, rho = carry
        Uf = jax.lax.fori_loop(
            0, cfg.newton_iters, lambda _, u: newton_step(u, lam, rho), Uf
        )
        c = constraints(Uf.reshape(N, m))
        lam = jnp.maximum(0.0, lam - rho * c)
        rho = rho * cfg.rho_growth
        return (Uf, lam, rho)

    Uf, lam, _ = jax.lax.fori_loop(
        0, cfg.outer_iters, outer_body, (Uf, lam, jnp.asarray(cfg.rho0, dtype))
    )

    U = Uf.reshape(N, m)
    c = constraints(U)
    viol = jnp.maximum(0.0, -jnp.min(c))
    xs = jnp.concatenate([x0[None, :], rollout(U)], axis=0)
    return MPCResult(
        u=U[0],
        state=MPCState(U=U, lam=lam),
        xs=xs,
        feasible=viol <= cfg.viol_tol,
        viol=viol,
    )
