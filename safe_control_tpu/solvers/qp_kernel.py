"""Pallas TPU kernel: batched dense QP ADMM sweep, fully resident in VMEM.

This is the hot op behind every CBF-QP / optimal-decay / BackupCBF control
step (SURVEY.md §2.4: the Gurobi/OSQP role).  The pure-XLA path
(solvers/qp.py) vmaps a ``fori_loop`` whose per-iteration state round-trips
through HBM and whose tiny batched Cholesky solves XLA lowers poorly on TPU.
Here ONE kernel invocation runs the entire staged-ADMM iteration loop for a
tile of problems, with

- problems laid out across *lanes* (tile = ``B_TILE`` problems, every scalar
  of the ADMM state is a ``(B_TILE,)`` vector => full 8x128 VPU utilization),
- the n x n KKT factorization unrolled at trace time (n <= 8: closed-form
  Cholesky on per-lane scalars — no batched-triangular-solve lowering),
- all iteration state (x, z, y, rho) living in VMEM/registers for the whole
  solve: zero HBM traffic between iterations.

Equilibration and the one-shot active-set polish stay in plain JAX around the
kernel (they run once, not ``iters`` times).  Math is identical to
solvers/qp.py: OSQP-convention ADMM with over-relaxation and per-stage
adaptive rho.

On non-TPU backends the kernel runs in Pallas interpreter mode, so the same
code path is testable on the CPU mesh (SURVEY.md §4).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from safe_control_tpu.solvers.qp import QPSolution, _polish

B_TILE = 1024  # problems per kernel instance; (B_TILE,) vectors = (8,128) VPU tiles
N_STAGES = 8  # adaptive-rho refactorization points (matches qp.py)
VMEM_BUDGET_BYTES = 4 * 1024 * 1024  # ~1/4 of a v5e core's VMEM: leaves room
# for the unrolled Cholesky/RHS temporaries, which roughly double the
# resident set counted in ``_tile_for``.


def _tile_for(n: int, m: int, n_batch: int) -> int:
    """Row-aware lane-tile size.

    The kernel holds per-lane: A (m*n rows), P (n*n), q (n), l/u (2m) as
    inputs plus x/z/y/rho/RHS/L state (~n*n + 2n + 3m registers/VMEM rows).
    At manipulator scale (m~153 rows, tracking.py:134-138) the default 1024
    lanes would need >5x the fp32 VMEM of the n<=4, m<=13 CBF-QP case, so the
    tile shrinks to keep the resident set under ``VMEM_BUDGET_BYTES`` —
    without this the kernel fails to fit (or silently spills) at large m.
    """
    rows = (m * n) + 2 * (n * n) + 3 * n + 7 * m + 4  # inputs + outputs + state
    tile = VMEM_BUDGET_BYTES // (rows * 4)
    tile = min(B_TILE, (tile // 128) * 128)
    tile = max(tile, 128)
    if n_batch < tile:
        tile = max(((n_batch + 127) // 128) * 128, 128)
    return tile


def _chol(K, n):
    """Unrolled Cholesky of an n x n SPD matrix of per-lane scalars.

    ``K`` is a list-of-lists of (B,) vectors; returns lower-triangular L in
    the same representation.  n is static and tiny, so this is ~n^3/6 fused
    VPU ops — the shape XLA's batched cho_factor never reaches on TPU.
    """
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = K[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-20))
            else:
                L[i][j] = s / L[j][j]
    return L


def _chol_solve(L, b, n):
    """Solve L L' x = b with unrolled forward/back substitution."""
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


def _admm_kernel(
    p_ref, q_ref, a_ref, l_ref, u_ref, x_out, y_out,
    *, n, m, iters, rho0, sigma, alpha,
):
    """Staged ADMM for one tile of problems (all refs lane-batched)."""
    dtype = q_ref.dtype
    A = [[a_ref[j * n + i] for i in range(n)] for j in range(m)]  # (B,) each
    P = [[p_ref[i * n + j] for j in range(n)] for i in range(n)]
    q = [q_ref[i] for i in range(n)]
    lo = l_ref[:]  # (m, B)
    hi = u_ref[:]

    # A'A once (symmetric): n^2 m FMAs.
    AtA = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[0][i] * A[0][j]
            for k in range(1, m):
                s = s + A[k][i] * A[k][j]
            AtA[i][j] = s
            AtA[j][i] = s

    B = q[0].shape[0]
    x = jnp.zeros((n, B), dtype)
    z = jnp.zeros((m, B), dtype)
    y = jnp.zeros((m, B), dtype)
    rho = jnp.full((B,), rho0, dtype)
    per_stage = max(iters // N_STAGES, 1)

    for _stage in range(N_STAGES):
        # Refactor K = P + sigma I + rho A'A at the current (per-lane) rho.
        K = [
            [
                P[i][j] + rho * AtA[i][j] + (sigma if i == j else 0.0)
                for j in range(n)
            ]
            for i in range(n)
        ]
        L = _chol(K, n)

        def body(_, carry, L=L):
            x, z, y = carry
            xl = [x[i] for i in range(n)]
            zl = [z[j] for j in range(m)]
            yl = [y[j] for j in range(m)]
            # rhs = sigma x - q + A'(rho z - y)
            w = [rho * zl[j] - yl[j] for j in range(m)]
            rhs = []
            for i in range(n):
                s = sigma * xl[i] - q[i]
                for j in range(m):
                    s = s + A[j][i] * w[j]
                rhs.append(s)
            xt = _chol_solve(L, rhs, n)
            x_new = jnp.stack([alpha * xt[i] + (1.0 - alpha) * xl[i] for i in range(n)])
            # z update with over-relaxation + projection
            zt = []
            for j in range(m):
                s = A[j][0] * xt[0]
                for i in range(1, n):
                    s = s + A[j][i] * xt[i]
                zt.append(s)
            z_hat = jnp.stack([alpha * zt[j] + (1.0 - alpha) * zl[j] for j in range(m)])
            z_new = jnp.clip(z_hat + y / rho[None, :], lo, hi)
            y_new = y + rho[None, :] * (z_hat - z_new)
            return (x_new, z_new, y_new)

        x, z, y = jax.lax.fori_loop(0, per_stage, body, (x, z, y))

        # Adaptive rho from the residual ratio (same rule as qp.py).
        ax = []
        for j in range(m):
            s = A[j][0] * x[0]
            for i in range(1, n):
                s = s + A[j][i] * x[i]
            ax.append(s)
        ax = jnp.stack(ax)
        r_prim = jnp.max(jnp.abs(ax - z), axis=0)
        dual_rows = []
        for i in range(n):
            s = q[i]
            for j in range(n):
                s = s + P[i][j] * x[j]
            for j in range(m):
                s = s + A[j][i] * y[j]
            dual_rows.append(s)
        r_dual = jnp.max(jnp.abs(jnp.stack(dual_rows)), axis=0)
        ratio = jnp.sqrt(
            jnp.maximum(r_prim, 1e-12) / jnp.maximum(r_dual, 1e-12)
        )
        rho = jnp.clip(rho * jnp.clip(ratio, 0.1, 10.0), 1e-4, 1e5)

    x_out[:] = x
    y_out[:] = y


@functools.partial(
    jax.jit,
    static_argnames=("iters", "rho", "sigma", "alpha", "polish", "interpret"),
)
def solve_qp_batch_pallas(
    P,
    q,
    A,
    l,
    u,
    iters: int = 1600,
    rho: float = 1.0,
    sigma: float = 1e-6,
    alpha: float = 1.6,
    polish: bool = True,
    interpret: bool | None = None,
) -> QPSolution:
    """Batched QP solve via the Pallas ADMM kernel.

    Arguments carry a leading batch axis: P (B,n,n), q (B,n), A (B,m,n),
    l/u (B,m).  Returns a batched ``QPSolution`` numerically matching
    ``vmap(solve_qp)`` (same equilibration, staged rho and polish).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Bt, m, n = A.shape
    dtype = q.dtype

    # --- batched row+column equilibration (mirrors qp.py) -----------------
    row_norm = jnp.linalg.norm(A, axis=2)
    d = 1.0 / jnp.maximum(row_norm, 1e-6)  # (B, m)
    As = A * d[:, :, None]
    ls = jnp.where(jnp.isfinite(l), l * d, l)
    us = jnp.where(jnp.isfinite(u), u * d, u)
    col_norm = jnp.linalg.norm(As, axis=1)
    e = 1.0 / jnp.sqrt(jnp.maximum(col_norm, 1e-6))  # (B, n)
    As = As * e[:, None, :]
    Ps = e[:, :, None] * P * e[:, None, :]
    qs = q * e

    # --- lane-major layout + batch padding ---------------------------------
    tile = _tile_for(n, m, Bt)
    pad = (-Bt) % tile
    Bp = Bt + pad

    def lanes(x, rows):
        x = jnp.pad(x.reshape(Bt, rows), ((0, pad), (0, 0)))
        return x.T  # (rows, Bp)

    p_t = lanes(Ps, n * n)
    q_t = lanes(qs, n)
    a_t = lanes(As, m * n)
    # Padded problems get inert bounds so clip/ADMM stay finite.
    l_t = jnp.pad(ls, ((0, pad), (0, 0)), constant_values=-1.0).T
    u_t = jnp.pad(us, ((0, pad), (0, 0)), constant_values=1.0).T

    kern = functools.partial(
        _admm_kernel, n=n, m=m, iters=iters, rho0=rho, sigma=sigma, alpha=alpha
    )
    grid = (Bp // tile,)
    spec = lambda rows: pl.BlockSpec(
        (rows, tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    x_t, y_t = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec(n * n), spec(n), spec(m * n), spec(m), spec(m)],
        out_specs=(spec(n), spec(m)),
        out_shape=(
            jax.ShapeDtypeStruct((n, Bp), dtype),
            jax.ShapeDtypeStruct((m, Bp), dtype),
        ),
        interpret=interpret,
    )(p_t, q_t, a_t, l_t, u_t)
    x_s = x_t.T[:Bt]  # (B, n), still in scaled variables
    y_s = y_t.T[:Bt]

    # --- one-shot polish + unscale + residuals (plain JAX, batched) --------
    if polish:
        x_s, y_s = jax.vmap(
            lambda Pb, qb, Ab, lb, ub, xb, yb: _polish(
                Pb, qb, Ab, lb, ub, xb, yb, 1e-8, 1e-4
            )
        )(Ps, qs, As, ls, us, x_s, y_s)

    x = e * x_s
    y = y_s * d
    Ax = jnp.einsum("bmn,bn->bm", A, x)
    prim = jnp.maximum(
        jnp.max(jnp.where(jnp.isfinite(l), (l - Ax) * d, -jnp.inf), axis=1),
        jnp.max(jnp.where(jnp.isfinite(u), (Ax - u) * d, -jnp.inf), axis=1),
    )
    prim = jnp.maximum(prim, 0.0)
    dual = jnp.max(
        jnp.abs(
            jnp.einsum("bij,bj->bi", P, x) + q + jnp.einsum("bmn,bm->bn", A, y)
        ),
        axis=1,
    )
    return QPSolution(x=x, y=y, prim_res=prim, dual_res=dual)
