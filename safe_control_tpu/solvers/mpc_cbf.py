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

from safe_control_tpu.barriers.hocbf import dt_h as hocbf_dt_h
from safe_control_tpu.solvers.chol import (
    _BLOCKED_CHOL_MAX,
    _UNROLL_CHOL_MAX,
    _chol_factor,
    _chol_solve_blocked,
    _chol_solve_unrolled,
    _chol_sub,
)
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
    # Optimal-decay variant (optimal_decay_mpc_cbf.py): per-stage decay
    # multipliers omega1, omega2 appended as extra inputs with soft penalty
    # p_sb toward omega_ref (:89-92, :175-178); CBF row becomes
    # dd_h + (a1 w1 + a2 w2) d_h + a1 a2 w1 w2 h_k >= 0 (:282-300).
    optimal_decay: bool = False
    p_sb: float = 10.0
    omega_ref: float = 1.0
    # Iteration budget: (8 outer x 3 newton) = 24 Newton steps runs ~2x
    # faster than (12 x 4) = 48 at equal closed-loop quality; more outer
    # iterations push rho higher, which stresses f32 without helping.  The
    # <1e-3 parity certification holds in the f64 accuracy mode with polish
    # (tests/test_parity_anchors.py); the f32 throughput mode at this budget
    # is envelope-bounded instead (median <5e-4, max <5e-2 in cost-flat
    # directions — see the precision accounting in that test's docstring).
    outer_iters: int = 8  # augmented-Lagrangian multiplier updates
    newton_iters: int = 3  # Gauss-Newton steps per outer iteration
    rho0: float = 50.0  # initial AL penalty
    rho_growth: float = 1.6
    rho_max: float = 2000.0  # cap: feasibility comes from multipliers, not
    # from unbounded penalty (unbounded rho destroys f32 line-search merit)
    reg: float = 1e-6  # Levenberg damping
    # Feasibility reporting threshold, scaled units.  Deliberately loose: it
    # flags only *genuine* infeasibility (no control keeps the constraints),
    # not solver slop at an active bound (~1e-4 raw).  Note the reference
    # never reports MPC infeasibility at all — its status is hardcoded
    # 'optimal' (mpc_cbf.py:10) — so scenario predicates only depend on this
    # in our stricter-than-reference mode.
    viol_tol: float = 0.05
    # Terminal active-set KKT polish: after the AL loop, take the AL
    # multipliers as an active-set estimate and run equality-constrained
    # Gauss-Newton steps on that set (Newton-on-KKT: quadratic convergence,
    # no merit function, no penalty).  In f64 this removes the AL's
    # linear-rate multiplier error (anchor deviations 9e-4 -> 5e-5 at the
    # 12x4 budget).  In f32 it is a wash: the Newton/Schur solves hit the
    # same kappa(H)*eps ~ 1e-3 conditioning floor that limits the main loop
    # (kappa ~ 1e4 from the cost-flat omega directions), so the default
    # stays 0 and the f64 accuracy/parity mode turns it on.
    polish_iters: int = 0
    polish_ctol: float = 1e-2  # scaled-units activity threshold

    @classmethod
    def rti(cls, **kw) -> "MPCConfig":
        """Real-time-iteration budget for LATENCY-critical single-robot
        control (Diehl-style RTI: a warm-started MPC needs only a few
        Gauss-Newton iterations per period because the previous solution is
        an excellent predictor one period later).

        Measured on the v5e (PERF.md): each Newton iteration of the VTOL
        N=30 solve costs ~3.9 ms on-device, so the default 8x3 = 24-Newton
        budget (91 ms device) cannot meet the 50 ms period regardless of
        dispatch overheads, while this 2x2 = 4-Newton schedule runs the
        full wrapper ``control_step`` in 41 ms median INCLUDING a ~25 ms
        tunnel round trip — within the reference's real-time budget — and
        passes the VTOL corridor scenario at full quality predicates
        (tests/test_vtol_e2e.py: clearance 0.93 m vs gate 0.3 m, goal
        reached faster than the accuracy budget).  Accuracy-certification
        paths keep the default budget.
        """
        kw.setdefault("outer_iters", 2)
        kw.setdefault("newton_iters", 2)
        return cls(**kw)
    # Mixed-precision experiment (round-3 verdict item 5): assemble the
    # Gauss-Newton system (grad, H = J'J) and run the Newton solve in f64
    # inside the otherwise-f32 solver.  Measured result (PERF.md): it fixes
    # the kappa(H)*eps_32 STEP floor but not the anchor-deviation tail —
    # the gradient itself is built from f32-rounded J and r, so its noise
    # (eps_32*|J||r|) dominates the asymptotic error, and the f32 merit's
    # eps*|r|^2 resolution still limits the line search.  Kept as an
    # opt-in knob; the certification path remains the full-f64 mode.
    newton_f64: bool = False
    # Route ``solve_batch`` through the fused Pallas mega-kernel
    # (solvers/mpc_du_kernel.py, 5.5x the XLA lowering on TPU) when the
    # configuration matches its specialization — see
    # ``fused_kernel_available``.  Opt-in: the kernel's Mosaic compile takes
    # ~15 min the FIRST time on a machine (then seconds via the persistent
    # compilation cache configured in safe_control_tpu/__init__.py).
    use_fused_kernel: bool = False
    # Dispatch-latency knob for LARGE-horizon single-robot solves: unroll
    # factor for the rollout ``lax.scan``.  The N-step rollout is a serial
    # dependency chain of small kernels; at batch=1 its wall time is kernel
    # dispatch latency, not FLOPs, and XLA fuses across unrolled iterations
    # (measured on v5e, VTOL2D N=30: see PERF.md round-5 section).  Keep 1
    # for batched/throughput use — unrolling only bloats compile there.
    # Numerics: unrolling changes XLA's fusion/contraction order, so f32
    # results differ at op-ordering-noise level (~6e-4 on the VTOL N=30
    # first control) — the same envelope class the fused-kernel parity
    # gates bound; certification paths keep unroll=1.
    scan_unroll: int = 1
    # Companion dispatch-latency knob: unroll the Newton and AL-outer
    # ``fori_loop``s themselves so XLA can fuse ACROSS iteration
    # boundaries (a rolled loop is an XLA While whose body is compiled in
    # isolation; cross-iteration fusion of the factorization/line-search
    # chains is only possible when the iterations are in one straight-line
    # program).  Measured on v5e VTOL2D N=30 (PERF.md round-5): ~1 ms
    # median win at the RTI budget through the wrapper (the path is
    # tunnel-RTT-dominated) for +94 s of first compile, and a >15-minute
    # XLA compile at the 8x3 accuracy budget — so this stays an OPT-IN
    # knob (same honest-negative-result class as newton_f64).  Same
    # op-ordering-noise numerics envelope as scan_unroll.
    loop_unroll: bool = False


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
    m_aug = model.N_CONTROLS + (2 if cfg.optimal_decay else 0)
    U = jnp.zeros((cfg.horizon, m_aug), dtype=dtype)
    if cfg.optimal_decay:
        U = U.at[:, model.N_CONTROLS:].set(cfg.omega_ref)
    return MPCState(U=U, lam=jnp.zeros((n_con,), dtype=dtype))


def _num_constraints(model, cfg: MPCConfig) -> int:
    n_bounded = int(_bounded_mask(model).sum())
    return cfg.horizon * cfg.num_obs + 2 * cfg.horizon * n_bounded


def _bounded_mask(model):
    import numpy as np

    # Static structure query; must stay concrete even inside a jit trace.
    with jax.ensure_compile_time_eval():
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


def fused_kernel_available(model_name: str, cfg: MPCConfig) -> bool:
    """True iff ``solve_batch`` can dispatch to the fused Pallas kernel.

    The kernel (solvers/mpc_du_kernel.py) is specialized to the BASELINE
    north-star configuration: DynamicUnicycle2D, horizon N=8, K=5 obstacle
    slots, the default AL/GN iteration budget, no optimal-decay, no polish.
    """
    from safe_control_tpu.solvers import mpc_du_kernel as duk

    return (
        model_name == spec_mod.DYNAMIC_UNICYCLE_2D
        and cfg.horizon == duk.N
        and cfg.num_obs == duk.K
        and not cfg.optimal_decay
        and not cfg.newton_f64  # the f32 kernel cannot honor f64 refinement
        and cfg.outer_iters == duk.OUTER
        and cfg.newton_iters == duk.NEWTON
        and cfg.polish_iters == 0
        and float(cfg.rho0) == duk.RHO0
        and float(cfg.rho_growth) == duk.RHO_GROWTH
        and float(cfg.rho_max) == duk.RHO_MAX
        and float(cfg.reg) == duk.REG
    )


def solve_batch(
    model_name: str,
    spec,
    xs,
    goals,
    obs,
    u_prevs,
    mpc_state: MPCState,
    dt: float,
    cfg: MPCConfig = MPCConfig(),
) -> MPCResult:
    """Batched MPC-CBF solve: (B, ...) leading axis on every array input.

    The public batch entry point.  With ``cfg.use_fused_kernel`` and a
    configuration matching ``fused_kernel_available`` (and f32 inputs), the
    whole AL-Gauss-Newton solve runs inside one Pallas mega-kernel with all
    iteration state VMEM-resident (measured 244k solves/s vs 44k for the
    XLA lowering on a v5e chip); otherwise it is the ``vmap`` of ``solve``.
    Both paths return identical result structure (the kernel path reports
    zero multipliers in ``state.lam`` — semantically equivalent, because
    ``solve`` cold-starts the multipliers on entry anyway).
    """
    if (
        cfg.use_fused_kernel
        and fused_kernel_available(model_name, cfg)
        and xs.dtype == jnp.float32
    ):
        from safe_control_tpu.solvers import mpc_du_kernel as duk

        model = get_model(model_name)
        params = (
            float(dt), float(spec.mpc_cbf_alpha1), float(spec.mpc_cbf_alpha2),
            float(spec.cbf_beta), float(spec.radius), float(spec.v_max),
            float(spec.a_max), float(spec.w_max),
        )
        res = duk.solve_du_batch(xs, goals, obs, u_prevs, mpc_state.U, params)

        def roll(x0, U):
            def stp(x, u):
                x1 = model.step(x, u, spec, dt)
                return x1, x1

            _, xs_r = jax.lax.scan(stp, x0, U)
            return jnp.concatenate([x0[None, :], xs_r], axis=0)

        xs_pred = jax.vmap(roll)(xs, res.U)
        return MPCResult(
            u=res.u,
            state=MPCState(U=res.U, lam=jnp.zeros_like(mpc_state.lam)),
            xs=xs_pred,
            feasible=res.viol <= cfg.viol_tol,
            viol=res.viol,
        )

    def one(x, goal, ob, up, U, lam):
        return solve(
            model_name, spec, x, goal, ob, up, MPCState(U=U, lam=lam), dt, cfg
        )

    return jax.vmap(one)(xs, goals, obs, u_prevs, mpc_state.U, mpc_state.lam)


def solve_dispatch(
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
    """``solve`` with opt-in routing to the generic fused Pallas kernel.

    With ``cfg.use_fused_kernel``, a supported configuration, and a
    CONCRETE spec (the kernel closes over spec values as scalars — inside
    jit this holds when the spec is a closure constant, as in the
    LocalTrackingController wrapper), the whole solve runs as one Pallas
    kernel — a single-launch path with no intermediate HBM round trips.
    Falls back to the XLA ``solve`` otherwise, and NEVER silently: every
    fallback is logged with its reason (a blanket except here masked a
    kernel-construction bug for a whole round), and only the narrow
    spec-concreteness probe may swallow an exception — any error raised by
    the kernel builder itself propagates.
    """
    if cfg.use_fused_kernel and x0.dtype == jnp.float32:
        from safe_control_tpu.solvers import mpc_fused

        if cfg.newton_f64:
            _log_fused_fallback(
                "newton_f64 requested: the f32 fused kernel would drop the "
                "explicit f64 Newton refinement — using the XLA path"
            )
        elif not mpc_fused.fused_available(model_name, cfg):
            _log_fused_fallback(
                f"configuration unsupported by the fused kernel "
                f"(model={model_name}, M={cfg.horizon}*m, "
                f"optimal_decay={cfg.optimal_decay}, "
                f"polish_iters={cfg.polish_iters})"
            )
        else:
            # Concreteness probe, kept deliberately narrow: ONLY the
            # "spec leaves are traced values" condition falls back.
            try:
                mpc_fused._spec_statics(spec)
                spec_concrete = True
            except (jax.errors.ConcretizationTypeError, TypeError):
                spec_concrete = False
            if spec_concrete:
                return mpc_fused.solve_fused_single(
                    model_name, spec, x0, goal, obs, u_prev, mpc_state,
                    dt, cfg,
                )
            _log_fused_fallback(
                "robot spec contains traced values (the kernel closes over "
                "spec scalars) — using the XLA path"
            )
    return solve(
        model_name, spec, x0, goal, obs, u_prev, mpc_state, dt, cfg
    )


_FUSED_FALLBACK_SEEN: set = set()


def _log_fused_fallback(reason: str) -> None:
    """Log each distinct fallback reason once per process: under jit this
    fires at trace time anyway, but an EAGER hot loop would otherwise emit
    the same warning every control period."""
    if reason in _FUSED_FALLBACK_SEEN:
        return
    _FUSED_FALLBACK_SEEN.add(reason)
    import logging

    logging.getLogger("safe_control_tpu.solvers").warning(
        "fused-kernel dispatch fell back to the XLA path: %s", reason
    )


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
    N, n = cfg.horizon, model.N_STATES
    m_ctrl = model.N_CONTROLS  # true control width (closures slice with this)
    m = m_ctrl + 2 if cfg.optimal_decay else m_ctrl  # decision width
    dtype = x0.dtype
    Qd, Rd = mpc_weights(model_name)
    Qs = jnp.sqrt(Qd).astype(dtype)
    Rs = jnp.sqrt(Rd).astype(dtype)
    lb_u, ub_u = model.u_lb(spec), model.u_ub(spec)
    if cfg.optimal_decay:
        # omegas softly pinned to omega_ref; box keeps them sane.
        lb_u = jnp.concatenate([lb_u, jnp.array([0.0, 0.0])])
        ub_u = jnp.concatenate([ub_u, jnp.array([10.0, 10.0])])
    lb_x, ub_x = model.state_bounds(spec)

    import numpy as np

    bounded = np.asarray(_bounded_mask(model))
    bounded_idx = tuple(int(i) for i in np.nonzero(bounded)[0])

    def rollout(U):
        def step_fn(x, u):
            x1 = model.step(x, u[:m_ctrl], spec, dt)
            return x1, x1

        _, xs = jax.lax.scan(step_fn, x0, U, unroll=cfg.scan_unroll)
        return xs  # (N, n): x_1..x_N

    def residual(U):
        xs = rollout(U)
        state_res = (xs - goal[None, :]) * Qs[None, :]
        du = jnp.diff(jnp.concatenate([u_prev[None, :], U[:, :m_ctrl]], axis=0), axis=0)
        input_res = du * Rs[None, :]
        parts = [state_res.ravel(), input_res.ravel()]
        if cfg.optimal_decay:
            om_res = (U[:, m_ctrl:] - cfg.omega_ref) * jnp.sqrt(cfg.p_sb)
            parts.append(om_res.ravel())
        return jnp.concatenate(parts)

    def _h_all(states):
        """Barrier values h(x, o) for a stack of states: (S, n) -> (S, K)."""
        return jax.vmap(
            lambda xk: jax.vmap(
                lambda o: hocbf_dt_h(model, model_name, xk, o, spec)
            )(obs)
        )(states)

    def constraints(U):
        """All inequality constraints c(U) >= 0, fixed shape.

        Work-sharing rewrite of the per-stage ``dt_hocbf_value`` evaluation
        (dynamic_unicycle2D.py:188-238 semantics, mpc_cbf.py:308-325 rows):
        the naive form evaluates h three times and steps the model twice per
        (stage, obstacle), but x1_k == x_{k+1} is already in the rollout and
        h(x_k)/h(x_{k+1}) are shared between consecutive stages.  Evaluating
        H = h(xs_full) once per obstacle plus one extra step per stage
        (x2_k = step(x_{k+1}, u_k) — same u_k, NOT x_{k+2}) cuts model.step
        calls per constraint evaluation from 2·N·K to N and h evaluations
        from 3·N·K to (2N+1)·K.  This is the hot op: it runs in the primal
        AND every forward-mode tangent of the Gauss-Newton loop.
        """
        xs = rollout(U)
        xs_full = jnp.concatenate([x0[None, :], xs], axis=0)  # (N+1, n)
        H = _h_all(xs_full)  # (N+1, K)
        h_k, h_k1 = H[:N], H[1:]
        if model.REL_DEG == 1:
            if cfg.optimal_decay:
                # optimal-decay row (optimal_decay_mpc_cbf.py:282-300)
                w1 = U[:, m_ctrl]
                cbf = (h_k1 - h_k) + spec.mpc_cbf_alpha * h_k * w1[:, None]
            else:
                cbf = (h_k1 - h_k) + spec.mpc_cbf_alpha * h_k
        else:
            x2 = jax.vmap(
                lambda xk1, uk: model.step(xk1, uk[:m_ctrl], spec, dt)
            )(xs_full[1:], U)  # (N, n)
            H2 = _h_all(x2)  # (N, K)
            d_h = h_k1 - h_k
            dd_h = H2 - 2.0 * h_k1 + h_k
            a1, a2 = spec.mpc_cbf_alpha1, spec.mpc_cbf_alpha2
            if cfg.optimal_decay:
                w1, w2 = U[:, m_ctrl], U[:, m_ctrl + 1]
                cbf = (
                    dd_h
                    + (a1 * w1 + a2 * w2)[:, None] * d_h
                    + (a1 * a2 * w1 * w2)[:, None] * h_k
                )
            else:
                cbf = dd_h + (a1 + a2) * d_h + a1 * a2 * h_k
        cons = [cbf.ravel()]
        for i in bounded_idx:
            cons.append(ub_x[i] - xs[:, i])  # upper
            cons.append(xs[:, i] - lb_x[i])  # lower
        return jnp.concatenate(cons)

    lb_flat = jnp.tile(lb_u, N)
    ub_flat = jnp.tile(ub_u, N)

    # Scan-based warm start: shift previous U by one stage (standard MPC).
    # Multipliers are NOT warm-started: they are per-stage/per-constraint and
    # a one-step shift changes the active set, which poisons the AL far more
    # than a cold lambda costs (observed closed-loop stalls).
    U0 = jnp.concatenate([mpc_state.U[1:], mpc_state.U[-1:]], axis=0)
    U0 = jnp.clip(U0, lb_u[None, :], ub_u[None, :])
    Uf = U0.ravel()
    lam = jnp.zeros_like(mpc_state.lam)

    # Constraint row scaling: dt-CBF rows have O(dt^2)-scale gradients (the
    # second difference of h), so raw feasibility tolerances translate into
    # huge control deviations.  Normalizing each row by its gradient norm at
    # the warm start (the same idea as the reference's h/dt "hard"-mode
    # scaling, cbf_qp.py:137-143) makes the AL tolerances control-relevant.
    Jc0 = jax.jacfwd(lambda Ufl: constraints(Ufl.reshape(N, m)))(Uf)
    c_scale = 1.0 / jnp.maximum(jnp.linalg.norm(Jc0, axis=1), 1e-2)

    def al_terms(U_flat, lam, rho):
        """Residual vector and AL activation vector at a point.

        AL for c >= 0:  L = r'r + (act'act - lam'lam)/(2 rho),
        act = max(0, lam - rho c).
        """
        U = U_flat.reshape(N, m)
        r = residual(U)
        c = constraints(U) * c_scale
        act = jnp.maximum(0.0, lam - rho * c)
        return r, act

    def al_grad_hess(U_flat, lam, rho):
        """AL gradient and Gauss-Newton Hessian from forward-mode Jacobians.

        No reverse-mode AD anywhere in the solver:  with 16-24 decision
        variables, forward-mode through the rollout is both cheaper and MUCH
        friendlier to the TPU compiler than jax.grad through the scan
        (reverse AD of the scan was a multi-minute compile).  One
        ``jax.linearize`` of the stacked [residual; constraints] map yields
        the primal values AND both Jacobians from a single rollout trace —
        the primal point and its tangents share all intermediate work.
        Closed forms:  grad = 2 Jr'r - Jc'act,  H = 2 Jr'Jr + rho Jc_a'Jc_a.
        """

        def rc(Uf_):
            U_ = Uf_.reshape(N, m)
            return residual(U_), constraints(U_) * c_scale

        (r, c), jvp = jax.linearize(rc, U_flat)
        basis = jnp.eye(N * m, dtype=dtype)
        Jr, Jc = jax.vmap(jvp)(basis)  # (Nm, n_r), (Nm, n_c) — row = d/dU_i
        act = jnp.maximum(0.0, lam - rho * c)
        if cfg.newton_f64 and dtype == jnp.float32:
            with jax.enable_x64(True):
                Jr64 = Jr.astype(jnp.float64)
                Jc64 = Jc.astype(jnp.float64)
                r64 = r.astype(jnp.float64)
                act64 = act.astype(jnp.float64)
                grad64 = 2.0 * (Jr64 @ r64) - Jc64 @ act64
                active = (act64 > 0.0).astype(jnp.float64)
                Jca = Jc64 * active[None, :]
                H64 = 2.0 * (Jr64 @ Jr64.T) + rho * (Jca @ Jca.T)
            return grad64, H64, r, act
        grad = 2.0 * (Jr @ r) - Jc @ act
        active = (act > 0.0).astype(dtype)
        Jca = Jc * active[None, :]
        H = 2.0 * (Jr @ Jr.T) + rho * (Jca @ Jca.T)
        return grad, H, r, act

    alphas = jnp.array([1.0, 0.5, 0.25, 0.1, 0.03, 0.0], dtype=dtype)

    def _newton_direction(Uf, grad, H, hdtype):
        """Damped projected-Newton direction at the given precision."""
        H = H + cfg.reg * jnp.eye(N * m, dtype=hdtype) * (
            1.0 + jnp.trace(H) / (N * m)
        )
        # Projected Newton (Bertsekas): freeze variables sitting at an active
        # box bound with the gradient pushing outward, otherwise the clipped
        # step bends into an ascent direction and the line search stalls.
        eps_b = 1e-7
        at_lb = (Uf <= lb_flat + eps_b) & (grad > 0.0)
        at_ub = (Uf >= ub_flat - eps_b) & (grad < 0.0)
        free = jnp.logical_not(at_lb | at_ub).astype(hdtype)
        Hf = free[:, None] * H * free[None, :] + jnp.diag(1.0 - free)
        gf = free * grad
        if hdtype == jnp.float64 or N * m > _BLOCKED_CHOL_MAX:
            step = -jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(Hf, lower=True), gf
            )
        elif N * m <= _UNROLL_CHOL_MAX:
            step = -_chol_solve_unrolled(Hf, gf)
        else:
            step = -_chol_solve_blocked(Hf, gf)
        return step, Hf, gf

    def newton_step(Uf, lam, rho):
        grad, H, r0, act0 = al_grad_hess(Uf, lam, rho)
        if cfg.newton_f64 and dtype == jnp.float32:
            with jax.enable_x64(True):
                step64, Hf64, gf64 = _newton_direction(
                    Uf.astype(jnp.float64), grad, H, jnp.float64
                )
            step = step64.astype(dtype)
            Hf = Hf64.astype(dtype)
            gf = gf64.astype(dtype)
        else:
            step, Hf, gf = _newton_direction(Uf, grad, H, dtype)

        # Line search on the *difference* of merits, computed cancellation-
        # free:  L(a) - L(0) = (r_a - r_0)·(r_a + r_0)
        #                     + [(act_a - act_0)·(act_a + act_0)] / (2 rho).
        # A naive L(a) comparison drowns O(1e-5) constraint-penalty changes
        # under an O(1e4) cost in f32 (goal 10 m away, Q=50), which silently
        # disabled constraint enforcement in closed loop.

        def merit_delta(a):
            cand = jnp.clip(Uf + a * step, lb_flat, ub_flat)
            r_a, act_a = al_terms(cand, lam, rho)
            d_cost = (r_a - r0) @ (r_a + r0)
            d_pen = ((act_a - act0) @ (act_a + act0)) / (2.0 * rho)
            return d_cost + d_pen

        vals = jax.vmap(merit_delta)(alphas)
        vals = jnp.where(jnp.isfinite(vals), vals, jnp.inf)
        # Noise-aware acceptance.  Near convergence the remaining improvement
        # per step drops below the f32 resolution of the merit difference
        # (roundoff of r_a - r0 with |r| ~ O(1e2) drowns O(1e-3) true deltas),
        # at which point argmin over deltas — which includes alpha=0 at
        # exactly 0 — degenerates into a random walk that stalls ~1e-2 from
        # the optimum in cost-flat directions (observed on the parity
        # anchors: DU MPC with CBF inactive, flat in omega).  Damped
        # Gauss-Newton contracts there *without* needing merit resolution
        # (its asymptotic error is H^-1 · gradient-noise ~ 1e-5, far below
        # the merit-noise-limited stall), so: when the quadratic model's own
        # predicted decrease is below the merit noise floor — i.e. the line
        # search physically cannot distinguish the candidates — take the full
        # damped Newton step.  In the measurable phase keep the argmin
        # backtracking, which handles the genuinely nonconvex far-from-
        # solution behavior.
        noise_floor = jnp.asarray(
            4.0 * jnp.finfo(dtype).eps, dtype
        ) * (r0 @ r0 + (act0 @ act0) / (2.0 * rho))
        pred = gf @ step + 0.5 * (step @ (Hf @ step))  # model delta at alpha=1
        noise_phase = pred >= -noise_floor
        best = jnp.where(noise_phase, 0, jnp.argmin(vals))
        return jnp.clip(Uf + alphas[best] * step, lb_flat, ub_flat)

    def outer_body(i, carry):
        Uf, lam, rho = carry
        Uf = jax.lax.fori_loop(
            0,
            cfg.newton_iters,
            lambda _, u: newton_step(u, lam, rho),
            Uf,
            unroll=cfg.newton_iters if cfg.loop_unroll else 1,
        )
        c = constraints(Uf.reshape(N, m)) * c_scale
        lam = jnp.maximum(0.0, lam - rho * c)
        rho = jnp.minimum(rho * cfg.rho_growth, cfg.rho_max)
        return (Uf, lam, rho)

    Uf, lam, _ = jax.lax.fori_loop(
        0,
        cfg.outer_iters,
        outer_body,
        (Uf, lam, jnp.asarray(cfg.rho0, dtype)),
        unroll=cfg.outer_iters if cfg.loop_unroll else 1,
    )

    # ---- terminal active-set KKT polish ---------------------------------
    # The AL loop converges the multipliers only linearly and its f32 line
    # search cannot resolve merit differences below ~eps * |r|^2, so the
    # iterate stalls ~1e-2 from the f64 optimum in cost-flat directions.
    # Newton-on-KKT removes both: take the AL multipliers as the active-set
    # estimate, push the active constraints to equality with an equality-
    # constrained Gauss-Newton step (Schur complement on the free variables),
    # clip negative multipliers (constraints that want to detach), repeat.
    # No merit function is involved, so f32 merit noise is irrelevant; each
    # accepted step is guarded by the true (scaled) violation so a bad
    # active-set guess can only be rejected, never destabilizing.
    if cfg.polish_iters > 0:
        n_dec = N * m

        def rc_pol(Uf_):
            U_ = Uf_.reshape(N, m)
            return residual(U_), constraints(U_) * c_scale

        def polish_once(carry, _):
            Uf, lam = carry
            (r, c), jvp = jax.linearize(rc_pol, Uf)
            basis = jnp.eye(n_dec, dtype=dtype)
            Jr, Jc = jax.vmap(jvp)(basis)  # (Nm, n_r), (Nm, n_c)
            g = 2.0 * (Jr @ r)
            grad_al = g - Jc @ lam
            eps_b = 1e-7
            at_lb = (Uf <= lb_flat + eps_b) & (grad_al > 0.0)
            at_ub = (Uf >= ub_flat - eps_b) & (grad_al < 0.0)
            free = jnp.logical_not(at_lb | at_ub).astype(dtype)
            H = 2.0 * (Jr @ Jr.T)
            H = H + cfg.reg * jnp.eye(n_dec, dtype=dtype) * (
                1.0 + jnp.trace(H) / n_dec
            )
            Hf = free[:, None] * H * free[None, :] + jnp.diag(1.0 - free)
            Cfree = free[:, None] * Jc  # (Nm, n_c)
            L = _chol_factor(Hf)
            gfree = free * g
            Hg = _chol_sub(L, gfree)
            Y = jax.vmap(lambda col: _chol_sub(L, col), in_axes=1, out_axes=1)(
                Cfree
            )
            S0 = Cfree.T @ Y
            q0 = Cfree.T @ Hg - c
            n_c = S0.shape[0]
            eyec = jnp.eye(n_c, dtype=dtype)

            def solve_mu(a):
                S = a[:, None] * S0 * a[None, :] + jnp.diag(1.0 - a)
                S = S + 1e-7 * jnp.trace(S) / n_c * eyec
                rhs = a * q0
                if n_c <= _BLOCKED_CHOL_MAX:
                    return _chol_solve_blocked(S, rhs)
                return jax.scipy.linalg.cho_solve(
                    jax.scipy.linalg.cho_factor(S, lower=True), rhs
                )

            # Working-set refinement: start from the AL estimate, then drop
            # rows whose multiplier comes out negative (constraints with
            # positive slack that an equality push would wrongly PULL DOWN
            # to their boundary — a one-shot max(mu, 0) cannot decouple
            # them from the genuinely active rows they are coupled to
            # through S).
            a = ((lam > 0.0) | (c < cfg.polish_ctol)).astype(dtype)
            for _refine in range(3):
                mu = solve_mu(a)
                a = a * (mu > 0.0).astype(dtype)
            mu = jnp.maximum(solve_mu(a), 0.0) * a
            dU = _chol_sub(L, Cfree @ mu - gfree) * free
            cand = jnp.clip(Uf + dU, lb_flat, ub_flat)
            # Guard: the step must stay small (it is a terminal correction)
            # and must not materially regress true feasibility.
            c_new = constraints(cand.reshape(N, m)) * c_scale
            viol0 = jnp.maximum(0.0, -jnp.min(c))
            viol1 = jnp.maximum(0.0, -jnp.min(c_new))
            ok = (jnp.max(jnp.abs(dU)) < 0.2) & (
                viol1 <= jnp.maximum(1.5 * viol0, 2e-3)
            )
            Uf = jnp.where(ok, cand, Uf)
            lam = jnp.where(ok, jnp.maximum(mu, 0.0), lam)
            return (Uf, lam), None

        (Uf, lam), _ = jax.lax.scan(
            polish_once, (Uf, lam), None, length=cfg.polish_iters
        )

    U = Uf.reshape(N, m)
    # Report violation in *scaled* (control-relevant) units.
    c = constraints(U) * c_scale
    viol = jnp.maximum(0.0, -jnp.min(c))
    xs = jnp.concatenate([x0[None, :], rollout(U)], axis=0)
    return MPCResult(
        u=U[0, :m_ctrl],
        state=MPCState(U=U, lam=lam),
        xs=xs,
        feasible=viol <= cfg.viol_tol,
        viol=viol,
    )
