"""Pallas TPU mega-kernel: fused AL-Gauss-Newton MPC-CBF for DynamicUnicycle2D.

Why this exists (PERF.md): the XLA lowering of ``mpc_cbf.solve`` runs at
0.01% of MXU peak and ~2% of HBM peak — the bound is kernel granularity:
one solve compiles to thousands of small fused HLOs whose intermediates
round-trip through HBM between kernels (366 kB moved per 16-variable
solve).  This kernel runs the ENTIRE solver — rollout, hand-derived
forward-mode Jacobians, augmented-Lagrangian outer loop, projected
Gauss-Newton with the noise-aware line search, unrolled 16x16 Cholesky —
for a lane-tile of problems in one ``pallas_call``, with every intermediate
living in VMEM/registers.

Scope: the BASELINE north-star configuration — DynamicUnicycle2D, horizon
N=8, K=5 obstacles (circle AND superellipsoid rows, same flag blend as
``barriers.geometry.h_point``), default ``MPCConfig`` iteration budget
(8 outer x 3 Newton, no optimal-decay, no polish).  The algorithm is a
line-for-line port of ``mpc_cbf.solve``'s math with Jacobians derived by
hand instead of ``jax.linearize`` (no AD inside Pallas):

    x_{k+1} = x_k + v_k cos th_k dt        dX/du via forward tangents
    y_{k+1} = y_k + v_k sin th_k dt        (16, B) arrays updated per step
    th_{k+1} = norm(th_k + w_k dt)
    v_{k+1} = v_k + a_k dt

Numerical agreement with the XLA path is test-bound (same iterations, same
merit logic; only op-ordering differs) — see tests/test_mpc_du_kernel.py.

On non-TPU backends the kernel runs in interpreter mode, so the same code
path is testable on the CPU mesh.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 8  # horizon
K = 5  # obstacle slots
M = 2 * N  # decision variables
NR = 4 * N + 2 * N  # residual rows: state (8x4) + input moves (8x2)
NC = N * K + 2 * N  # constraint rows: CBF (8x5) + v bounds (8x2)

# Default MPCConfig budget (solvers/mpc_cbf.py).
OUTER = 8
NEWTON = 3
RHO0 = 50.0
RHO_GROWTH = 1.6
RHO_MAX = 2000.0
REG = 1e-6
ALPHAS = (1.0, 0.5, 0.25, 0.1, 0.03, 0.0)
NOISE_EPS = 4.0 * 1.1920929e-7  # 4 * eps_f32 (noise-aware line search)

# DU cost weights (mpc_cbf._WEIGHTS).
SQ = tuple(math.sqrt(w) for w in (50.0, 50.0, 0.01, 30.0))
SR = tuple(math.sqrt(w) for w in (0.5, 0.5))

B_TILE = 128


class DuKernelResult(NamedTuple):
    u: jnp.ndarray  # (B, 2)
    U: jnp.ndarray  # (B, N, 2)
    viol: jnp.ndarray  # (B,)


def _chol16(H):
    """Unrolled Cholesky of a 16x16 matrix of (B,) lane vectors."""
    n = M
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = H[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-20))
            else:
                L[i][j] = s / L[j][j]
    return L


def _chol16_solve(L, b):
    n = M
    w = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * w[k]
        w[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = w[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _mpc_du_kernel(
    x0_ref, goal_ref, obs_ref, uprev_ref, u0_ref, u_out, viol_out,
    *, dt, a1, a2, beta, radius, v_max, a_max, w_max,
):
    dtype = x0_ref.dtype
    B = x0_ref.shape[-1]
    x0 = [x0_ref[i] for i in range(4)]
    goal = [goal_ref[i] for i in range(4)]
    obs = [[obs_ref[o * 7 + j] for j in range(7)] for o in range(K)]
    uprev = [uprev_ref[0], uprev_ref[1]]
    twopi = 2.0 * math.pi

    # Box bounds as iota-derived patterns (Pallas kernels cannot capture
    # constant arrays): even rows are accel (+-a_max), odd rows omega.
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    is_w = (row_idx % 2) == 1
    ub = jnp.where(is_w, w_max, a_max).astype(dtype)  # (16, 1)
    lb = -ub

    # Per-obstacle static-ish (lane) quantities for the barrier blend.
    obs_pre = []
    for o in range(K):
        ox, oy, orad, ob_, oe, oth, ofl = obs[o]
        a_se = jnp.maximum(jnp.abs(orad), 1e-3) + radius
        b_se = jnp.maximum(jnp.abs(ob_), 1e-3) + radius
        e_se = jnp.maximum(jnp.abs(oe), 2.0)
        ct, st = jnp.cos(oth), jnp.sin(oth)
        d_min = orad + radius
        circ_off = beta * d_min * d_min
        is_circle = ofl < 0.5
        obs_pre.append((ox, oy, a_se, b_se, e_se, ct, st, circ_off, is_circle))

    def h_and_grad(px, py, o, need_grad):
        """Barrier value (B,) and position-gradient for obstacle o at (px, py).

        Same circle/superellipsoid flag blend as barriers.geometry.h_point.
        """
        ox, oy, a_se, b_se, e_se, ct, st, circ_off, is_circle = obs_pre[o]
        dx = px - ox
        dy = py - oy
        h_c = dx * dx + dy * dy - circ_off
        pxr = ct * dx + st * dy
        pyr = -st * dx + ct * dy
        qa = jnp.abs(pxr) / a_se
        qb = jnp.abs(pyr) / b_se
        # |q|^e with the same power lowering as the XLA path
        qa_e = jnp.power(jnp.maximum(qa, 1e-12), e_se)
        qb_e = jnp.power(jnp.maximum(qb, 1e-12), e_se)
        h_s = qa_e + qb_e - 1.0
        h = jnp.where(is_circle, h_c, h_s)
        if not need_grad:
            return h, None, None
        # circle grad
        gcx = 2.0 * dx
        gcy = 2.0 * dy
        # superellipsoid grad: dh/dpxr = e/a * sign(pxr) * qa^{e-1}
        dpx = e_se / a_se * jnp.sign(pxr) * jnp.power(jnp.maximum(qa, 1e-12), e_se - 1.0)
        dpy = e_se / b_se * jnp.sign(pyr) * jnp.power(jnp.maximum(qb, 1e-12), e_se - 1.0)
        gsx = dpx * ct - dpy * st
        gsy = dpx * st + dpy * ct
        gx = jnp.where(is_circle, gcx, gsx)
        gy = jnp.where(is_circle, gcy, gsy)
        return h, gx, gy

    zeros16 = jnp.zeros((M, B), dtype)

    def one_hot_row(idx):
        # Mosaic has no scatter; build the one-hot via the iota comparison.
        return (row_idx == idx).astype(dtype)  # (M, 1)

    def forward(U, need_jac):
        """Rollout + residuals + constraints (+ Jacobians as (rows, 16, B)).

        ``U`` is (16, B).  Returns (r (NR,B), c (NC,B), Jr, Jc) — Jacobians
        are None when ``need_jac`` is False.
        """
        x, y, th, v = x0
        TX = TY = TTH = TV = zeros16 if need_jac else None
        r_rows = []
        Jr_rows = []
        cbf_rows = [[None] * K for _ in range(N)]
        Jc_cbf = [[None] * K for _ in range(N)] if need_jac else None
        vub_rows, vlb_rows = [], []
        Jv_rows = [] if need_jac else None  # tangent of v_k (shared ub/lb)

        # h at x0 (zero tangent)
        h_prev = []
        for o in range(K):
            h0, _, _ = h_and_grad(x, y, o, False)
            h_prev.append(h0)
        g_prev = [None] * K  # gradient-tangent product rows at previous state
        if need_jac:
            g_prev = [jnp.zeros((M, B), dtype) for _ in range(K)]

        for k in range(N):
            a_k = U[2 * k]
            w_k = U[2 * k + 1]
            cth, sth = jnp.cos(th), jnp.sin(th)
            x1 = x + v * cth * dt
            y1 = y + v * sth * dt
            th1 = th + w_k * dt
            th1 = th1 - twopi * jnp.floor((th1 + math.pi) / twopi)  # normalize
            v1 = v + a_k * dt
            if need_jac:
                TX1 = TX + dt * (TV * cth[None, :] - (v * sth)[None, :] * TTH)
                TY1 = TY + dt * (TV * sth[None, :] + (v * cth)[None, :] * TTH)
                TTH1 = TTH + dt * one_hot_row(2 * k + 1)
                TV1 = TV + dt * one_hot_row(2 * k)

            # x2 = step(x1, u_k) — same control again (NOT x_{k+2})
            c1, s1 = jnp.cos(th1), jnp.sin(th1)
            x2 = x1 + v1 * c1 * dt
            y2 = y1 + v1 * s1 * dt
            if need_jac:
                TX2 = TX1 + dt * (TV1 * c1[None, :] - (v1 * s1)[None, :] * TTH1)
                TY2 = TY1 + dt * (TV1 * s1[None, :] + (v1 * c1)[None, :] * TTH1)

            # state residual rows (x1 - goal) * sqrt(Q)
            for idx, (val, gl, sq) in enumerate(
                ((x1, goal[0], SQ[0]), (y1, goal[1], SQ[1]),
                 (th1, goal[2], SQ[2]), (v1, goal[3], SQ[3]))
            ):
                r_rows.append((val - gl) * sq)
                if need_jac:
                    T = (TX1, TY1, TTH1, TV1)[idx]
                    Jr_rows.append(T * sq)

            # CBF rows: dd_h + (a1+a2) d_h + a1 a2 h_k
            for o in range(K):
                h1, gx1, gy1 = h_and_grad(x1, y1, o, need_jac)
                h2, gx2, gy2 = h_and_grad(x2, y2, o, need_jac)
                cbf_rows[k][o] = (
                    (h2 - 2.0 * h1 + h_prev[o])
                    + (a1 + a2) * (h1 - h_prev[o])
                    + (a1 * a2) * h_prev[o]
                )
                if need_jac:
                    g1 = gx1[None, :] * TX1 + gy1[None, :] * TY1
                    g2 = gx2[None, :] * TX2 + gy2[None, :] * TY2
                    Jc_cbf[k][o] = (
                        (g2 - 2.0 * g1 + g_prev[o])
                        + (a1 + a2) * (g1 - g_prev[o])
                        + (a1 * a2) * g_prev[o]
                    )
                    g_prev[o] = g1
                h_prev[o] = h1

            vub_rows.append(v_max - v1)
            vlb_rows.append(v1 + v_max)
            if need_jac:
                Jv_rows.append(TV1)

            x, y, th, v = x1, y1, th1, v1
            if need_jac:
                TX, TY, TTH, TV = TX1, TY1, TTH1, TV1

        # input-move residual rows du * sqrt(R).  Their Jacobian rows are
        # CONSTANT one/two-hot patterns; materializing them would be a
        # captured constant in Pallas, so their grad/Hessian contributions
        # are added analytically in ``newton_step`` instead of here.
        for k in range(N):
            for j in range(2):
                prev = uprev[j] if k == 0 else U[2 * (k - 1) + j]
                r_rows.append((U[2 * k + j] - prev) * SR[j])

        r = jnp.stack(r_rows)  # (NR, B)
        c = jnp.stack(
            [cbf_rows[k][o] for k in range(N) for o in range(K)]
            + vub_rows + vlb_rows
        )  # (NC, B)
        if not need_jac:
            return r, c, None, None
        # Jacobian ROW LISTS (each (16, B)): Mosaic rejects reductions over
        # sliced 3D operands, so H/grad are accumulated row-by-row as outer
        # products instead of stacked-einsum reductions.
        Jc_rows = (
            [Jc_cbf[k][o] for k in range(N) for o in range(K)]
            + [Jv * -1.0 for Jv in Jv_rows]
            + Jv_rows
        )
        return r, c, Jr_rows, Jc_rows

    # ---- constraint row scaling at the warm start -------------------------
    U0 = u0_ref[:]  # (16, B)
    _, _, _, Jc0_rows = forward(U0, True)
    c_scale = 1.0 / jnp.maximum(
        jnp.sqrt(jnp.stack([jnp.sum(rw * rw, axis=0) for rw in Jc0_rows])),
        1e-2,
    )  # (NC, B)

    def al_terms(U, lam, rho):
        r, c, _, _ = forward(U, False)
        cs = c * c_scale
        act = jnp.maximum(0.0, lam - rho[None, :] * cs)
        return r, act

    # Analytic 2 * Jr_in' Jr_in entries for the constant input-move rows
    # (python floats — see the comment in ``forward``).
    def _input_hess(i, j):
        if i == j:
            k, jj = i // 2, i % 2
            cnt = 1 + (1 if k < N - 1 else 0)
            return 2.0 * SR[jj] ** 2 * cnt
        lo, hi = min(i, j), max(i, j)
        if hi - lo == 2 and (lo % 2) == (hi % 2):
            return -2.0 * SR[lo % 2] ** 2
        return 0.0

    srvec = jnp.where(is_w, SR[1], SR[0]).astype(dtype)  # (16, 1)

    def newton_step(U, lam, rho):
        r, c, Jr_rows, Jc_rows = forward(U, True)
        cs = c * c_scale
        act = jnp.maximum(0.0, lam - rho[None, :] * cs)
        n_state = 4 * N

        # grad = 2 Jr'r - Jc'act and H = 2 Jr'Jr + rho Jca'Jca, accumulated
        # row-by-row as outer products ((16,B) x (16,B) -> (16,16,B)); no
        # reductions over stacked/sliced 3D operands (Mosaic constraint).
        grad = jnp.zeros((M, B), dtype)
        H3 = jnp.zeros((M, M, B), dtype)
        for ri, row in enumerate(Jr_rows):
            rv = r[ri]
            grad = grad + 2.0 * row * rv[None, :]
            H3 = H3 + 2.0 * row[:, None, :] * row[None, :, :]
        for ci, row in enumerate(Jc_rows):
            rows_s = row * c_scale[ci][None, :]
            a_c = act[ci]
            grad = grad - rows_s * a_c[None, :]
            active_c = (a_c > 0.0).astype(dtype)
            ra = rows_s * active_c[None, :]
            H3 = H3 + rho[None, None, :] * ra[:, None, :] * ra[None, :, :]
        # input-move rows: analytic contributions
        r_in = jax.lax.slice_in_dim(r, n_state, NR, axis=0)  # (16, B)
        adds = 2.0 * srvec * r_in
        grad = grad + adds
        shifted = jnp.concatenate(
            [jax.lax.slice_in_dim(adds, 2, M, axis=0),
             jnp.zeros((2,) + adds.shape[1:], dtype)], axis=0
        )
        grad = grad - shifted
        ih = [[_input_hess(i, j) for j in range(M)] for i in range(M)]
        # constant input-move Hessian: add via scalar H entries at chol time
        tr = H3[0, 0] + ih[0][0]
        for i in range(1, M):
            tr = tr + H3[i, i] + ih[i][i]
        damp = REG * (1.0 + tr / M)

        # projected free set at active box bounds
        eps_b = 1e-7
        at_lb = (U <= lb + eps_b) & (grad > 0.0)
        at_ub = (U >= ub - eps_b) & (grad < 0.0)
        free = jnp.logical_not(at_lb | at_ub).astype(dtype)  # (16, B)
        gf = free * grad
        Hf = [[None] * M for _ in range(M)]
        for i in range(M):
            for j in range(i + 1):
                hij = (H3[i, j] + ih[i][j]) * free[i] * free[j]
                if i == j:
                    hij = hij + damp * free[i] + (1.0 - free[i])
                Hf[i][j] = hij
                Hf[j][i] = hij
        L = _chol16(Hf)
        step_l = _chol16_solve(L, [-gf[i] for i in range(M)])
        step = jnp.stack(step_l)  # (16, B)

        r0, act0 = al_terms(U, lam, rho)
        base_cost = jnp.sum(r0 * r0, axis=0) + jnp.sum(act0 * act0, axis=0) / (
            2.0 * rho
        )
        deltas = []
        for a in ALPHAS:
            cand = jnp.clip(U + a * step, lb, ub)
            r_a, act_a = al_terms(cand, lam, rho)
            d_cost = jnp.sum((r_a - r0) * (r_a + r0), axis=0)
            d_pen = jnp.sum((act_a - act0) * (act_a + act0), axis=0) / (
                2.0 * rho
            )
            deltas.append(d_cost + d_pen)
        deltas = jnp.stack(deltas)  # (6, B)
        deltas = jnp.where(jnp.isfinite(deltas), deltas, jnp.inf)
        best = jnp.argmin(deltas, axis=0)  # (B,)
        # noise-aware acceptance (mpc_cbf.newton_step)
        noise_floor = NOISE_EPS * base_cost
        Hstep = [None] * M
        for i in range(M):
            s = Hf[i][0] * step[0]
            for j in range(1, M):
                s = s + Hf[i][j] * step[j]
            Hstep[i] = s
        pred = jnp.sum(gf * step, axis=0) + 0.5 * jnp.sum(
            step * jnp.stack(Hstep), axis=0
        )
        best = jnp.where(pred >= -noise_floor, 0, best)
        # branch-free alpha pick (gather with traced indices is not a
        # Mosaic-friendly op)
        alpha_vec = jnp.zeros_like(pred)
        for i, a in enumerate(ALPHAS):
            alpha_vec = jnp.where(best == i, a, alpha_vec)
        return jnp.clip(U + alpha_vec[None, :] * step, lb, ub)

    def outer_body(_, carry):
        U, lam, rho = carry
        U = jax.lax.fori_loop(
            0, NEWTON, lambda _, u: newton_step(u, lam, rho), U
        )
        _, c, _, _ = forward(U, False)
        cs = c * c_scale
        lam = jnp.maximum(0.0, lam - rho[None, :] * cs)
        rho = jnp.minimum(rho * RHO_GROWTH, RHO_MAX)
        return (U, lam, rho)

    U = jnp.clip(U0, lb, ub)
    lam = jnp.zeros((NC, B), dtype)
    rho = jnp.full((B,), RHO0, dtype)
    U, lam, rho = jax.lax.fori_loop(0, OUTER, outer_body, (U, lam, rho))

    _, c, _, _ = forward(U, False)
    viol = jnp.maximum(0.0, -jnp.min(c * c_scale, axis=0))
    u_out[:] = U
    viol_out[:] = viol[None, :]


@functools.partial(jax.jit, static_argnames=("spec_params", "interpret", "b_tile"))
def solve_du_batch(
    xs, goals, obs, u_prevs, U_warm, spec_params,
    interpret: bool | None = None, b_tile: int = B_TILE,
) -> DuKernelResult:
    """Batched DU N=8 MPC-CBF via the fused Pallas kernel.

    ``xs`` (B,4), ``goals`` (B,4), ``obs`` (B,5,7), ``u_prevs`` (B,2),
    ``U_warm`` (B,8,2) — the PREVIOUS solution (the kernel wrapper applies
    the same shift-by-one warm start as ``mpc_cbf.solve``).
    ``spec_params`` = (dt, a1, a2, beta, radius, v_max, a_max, w_max) floats.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dt, a1, a2, beta, radius, v_max, a_max, w_max = (
        float(p) for p in spec_params
    )
    Bt = xs.shape[0]
    dtype = xs.dtype

    U0 = jnp.concatenate([U_warm[:, 1:], U_warm[:, -1:]], axis=1)  # shift
    lbv = jnp.asarray([-a_max, -w_max], dtype)
    ubv = jnp.asarray([a_max, w_max], dtype)
    U0 = jnp.clip(U0, lbv[None, None, :], ubv[None, None, :])

    pad = (-Bt) % b_tile
    Bp = Bt + pad

    def lanes(x, rows):
        x = jnp.pad(x.reshape(Bt, rows), ((0, pad), (0, 0)))
        return x.T  # (rows, Bp)

    x_t = lanes(xs, 4)
    g_t = lanes(goals, 4)
    o_t = lanes(obs, K * 7)
    up_t = lanes(u_prevs, 2)
    u0_t = lanes(U0, M)

    kern = functools.partial(
        _mpc_du_kernel, dt=dt, a1=a1, a2=a2, beta=beta, radius=radius,
        v_max=v_max, a_max=a_max, w_max=w_max,
    )
    grid = (Bp // b_tile,)
    spec = lambda rows: pl.BlockSpec(
        (rows, b_tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    U_t, viol_t = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec(4), spec(4), spec(K * 7), spec(2), spec(M)],
        out_specs=(spec(M), spec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((M, Bp), dtype),
            jax.ShapeDtypeStruct((1, Bp), dtype),
        ),
        interpret=interpret,
    )(x_t, g_t, o_t, up_t, u0_t)
    U = U_t.T[:Bt].reshape(Bt, N, 2)
    return DuKernelResult(u=U[:, 0], U=U, viol=viol_t[0, :Bt])
