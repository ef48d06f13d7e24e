"""Generic fused Pallas MPC-CBF kernel, templated over (model, N, K, budget).

Why: PERF.md's roofline showed the XLA lowering of ``mpc_cbf.solve`` is
occupancy-bound — thousands of small fused HLOs whose intermediates
round-trip through HBM, each paying kernel-launch latency.  For batch
throughput the hand-written lane-tiled DU kernel (mpc_du_kernel.py) fixes
this at 5.5x; but it is specialized to DynamicUnicycle2D/N=8 by hand-derived
Jacobians.  This module is the *template* the round-3 verdict asked for:
the ENTIRE augmented-Lagrangian Gauss-Newton solver — unrolled rollout,
forward-mode Jacobians, MXU-backed Gauss-Newton Hessian, masked unrolled
Cholesky, the noise-aware line search — fused into ONE ``pallas_call`` per
problem, for ANY registered model and horizon.

The trick that makes it generic: JAX transformations are trace-time, so
``jax.linearize`` + ``jax.vmap`` over the basis work INSIDE a Pallas kernel
body (verified on Mosaic) — the kernel literally reuses the package's
``model.step`` and ``barriers.hocbf.dt_h`` instead of hand-derived
Jacobians.  One problem per grid step, matrices in natural 2-D layout:
J^T J runs on the MXU, everything else on the VPU, all iteration state
VMEM-resident.

Primary target: single-robot control LATENCY on large-horizon models —
the BASELINE real-time row where VTOL2D N=30 (120 decision variables) was
the one red entry (117.9 ms vs the 50 ms budget through the XLA path; the
measured tunnel round-trip floor alone is ~25 ms, so on-device solve time
must drop ~4x, which kernel fusion provides).  The grid iterates problems
sequentially on one TensorCore, so for large-batch throughput of SMALL
problems the lane-tiled DU kernel or the XLA path remain the right
backends; ``mpc_cbf.solve_batch`` dispatches accordingly.

Algorithm provenance: line-for-line ``mpc_cbf.solve`` (same AL/GN/line-
search logic; reference behavior /root/reference/position_control/
mpc_cbf.py:134-364).  Agreement with the XLA path is f32 op-ordering noise,
test-bound in tests/test_mpc_fused.py.

Mosaic constraints honored (see pallas_guide.md and round-3 notes):
no captured constant arrays (constant vectors are built from 2-D iota
one-hots), no 1-D iota, no gathers with traced indices (branch-free
selects), ``preferred_element_type`` on every MXU dot.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from safe_control_tpu.barriers.hocbf import dt_h as hocbf_dt_h
from safe_control_tpu.dynamics import get_model
from safe_control_tpu.solvers import mpc_cbf as mpc_mod


class FusedResult(NamedTuple):
    u: jnp.ndarray  # (B, m) first controls
    U: jnp.ndarray  # (B, N, m)
    xs: jnp.ndarray  # (B, N+1, n) predicted states
    viol: jnp.ndarray  # (B,)


def fused_available(model_name: str, cfg: mpc_mod.MPCConfig) -> bool:
    """The generic kernel supports everything but the optimal-decay and
    polish variants (their extra decision/KKT structure is XLA-path only).

    Decision widths above ~64 are also excluded: the Mosaic compile of the
    fused program grows super-linearly with the unrolled problem size and
    was measured to exceed the TPU compile helper's memory/time at M=120
    (VTOL N=30) — that latency case is served by the RTI budget
    (``MPCConfig.rti``) on the XLA path instead; see PERF.md.
    """
    try:
        model = get_model(model_name)
    except Exception:
        return False
    if cfg.horizon * model.N_CONTROLS > 64:
        return False
    # newton_f64 is excluded: the f32 kernel would silently drop the
    # explicitly requested f64 Newton refinement.
    return (
        not cfg.optimal_decay
        and cfg.polish_iters == 0
        and not cfg.newton_f64
    )


def _irange(M: int):
    """(M,) int32 index vector (TPU rejects 1-D iota; go through 2-D)."""
    return jax.lax.broadcasted_iota(jnp.int32, (1, M), 1).reshape(M)


def _const_vec(vals, dtype):
    """Materialize a small constant vector without capturing a constant
    array (Mosaic rejects those): one-hot composition over a 2-D iota."""
    M = len(vals)
    idx = _irange(M)
    out = jnp.zeros((M,), dtype)
    for i, v in enumerate(vals):
        out = jnp.where(idx == i, jnp.asarray(float(v), dtype), out)
    return out


def _tiled_const_vec(vals, reps, dtype):
    """tile(vals, reps) via modulo one-hots (for flat box bounds)."""
    m = len(vals)
    idx = _irange(m * reps) % m
    out = jnp.zeros((m * reps,), dtype)
    for i, v in enumerate(vals):
        out = jnp.where(idx == i, jnp.asarray(float(v), dtype), out)
    return out


def _spec_statics(spec):
    """Concrete-float copy of a RobotSpec (kernel closes over scalars)."""
    return jax.tree_util.tree_map(float, spec)


def mosaic_atan2(y, x):
    """Branch-free polynomial atan2 (Mosaic has no atan2 lowering).

    Octant reduction to q = min/max in [0, 1] + an odd minimax polynomial
    (max error ~1e-6 rad, far below the solver's f32 noise floor), then
    quadrant fixup with selects.  Used only inside fused kernels — the XLA
    path keeps libm atan2; parity tests bound the difference.
    """
    pi = float(np.pi)
    ax, ay = jnp.abs(x), jnp.abs(y)
    mx = jnp.maximum(jnp.maximum(ax, ay), 1e-30)
    q = jnp.minimum(ax, ay) / mx
    q2 = q * q
    # atan(q) on [0, 1], minimax odd polynomial (Horner)
    r = q * (0.99997726 + q2 * (-0.33262347 + q2 * (0.19354346 + q2 * (
        -0.11643287 + q2 * (0.05265332 + q2 * -0.01172120)))))
    r = jnp.where(ay > ax, 0.5 * pi - r, r)
    r = jnp.where(x < 0.0, pi - r, r)
    return jnp.where(y < 0.0, -r, r)


def _mosaic_atan(x):
    return mosaic_atan2(x, jnp.ones_like(x) if hasattr(x, "shape") else 1.0)


def _manual_dot(a, b, dimension_numbers, preferred_element_type):
    """dot_general as broadcast-multiply + reduce-sum (no dot primitive).

    Mosaic supports plain 2-D x 2-D matmuls but rejects the batched /
    higher-rank dot_generals that ``vmap`` of model matvecs produces
    (malformed TPU_DotDimensionNumbers for rank-3+ operands).  Shapes here
    are tiny, so the VPU multiply+reduce form costs nothing.
    """
    (lc, rc), (lb, rb) = dimension_numbers
    a_free = [i for i in range(a.ndim) if i not in lc and i not in lb]
    b_free = [i for i in range(b.ndim) if i not in rc and i not in rb]
    # layout: (batch..., free..., contract...)
    at = jnp.transpose(a, list(lb) + a_free + list(lc))
    bt = jnp.transpose(b, list(rb) + b_free + list(rc))
    nb, nc = len(lb), len(lc)
    naf, nbf = len(a_free), len(b_free)
    # a: (batch, a_free, 1*nbf, contract); b: (batch, 1*naf, b_free, contract)
    a_exp = at.reshape(
        at.shape[:nb + naf] + (1,) * nbf + at.shape[nb + naf:]
    )
    bt_shape = bt.shape
    b_exp = bt.reshape(
        bt_shape[:nb] + (1,) * naf + bt_shape[nb:]
    )
    prod = a_exp * b_exp
    out = jnp.sum(prod, axis=tuple(range(prod.ndim - nc, prod.ndim)))
    if preferred_element_type is not None:
        out = out.astype(preferred_element_type)
    return out


def _strip_units(shape):
    return tuple(d for d in shape if d != 1)



def _sum_over_sublane(x):
    """sum over axis -2 with the reduction moved to the trailing (lane)
    axis first — Mosaic rejects sublane reductions with rank-dropped
    outputs ("unsupported output implicit dimension")."""
    return jnp.sum(jnp.swapaxes(x, -1, -2), axis=-1)

def _merge_last_two(x):
    """(..., R, C) -> (..., R*C) via iota-mask contractions.

    Mosaic rejects cross-lane reshapes outright, and concatenating SLICES
    crashes its layout pass ("result/input offset mismatch on non-concat
    dimension": each slice carries the offset it was cut at).  Mask
    contractions produce fresh zero-offset values: piece i lands in lanes
    [i*C, (i+1)*C) of the output through a (C, R*C) selection mask.
    """
    R, C = x.shape[-2], x.shape[-1]
    if R == 1:
        return jax.lax.squeeze(x, (x.ndim - 2,))
    if C == 1:  # (.., R, 1) -> (.., R): lane<->sublane transpose + squeeze
        xt = jnp.swapaxes(x, -1, -2)  # (.., 1, R)
        return jax.lax.squeeze(xt, (xt.ndim - 2,))
    S = R * C
    lane = jax.lax.broadcasted_iota(jnp.int32, (C, S), 1)
    src = jax.lax.broadcasted_iota(jnp.int32, (C, S), 0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    out = None
    for i in range(R):
        P = (src == lane - i * C).astype(x.dtype) * (
            (lane >= i * C) & (lane < (i + 1) * C)
        ).astype(x.dtype)
        # row extraction by mask-sum, not by slicing (offset layouts)
        piece = _sum_over_sublane(x * (rows == i).astype(x.dtype))
        contrib = _sum_over_sublane(piece[..., :, None] * P)  # (..., S)
        out = contrib if out is None else out + contrib
    return out


def _split_last(x, R, C):
    """(..., R*C) -> (..., R, C) via iota-mask contractions (see
    ``_merge_last_two`` for why slices + concat cannot be used)."""
    if R == 1:
        return x[..., None, :]
    if C == 1:  # (.., T) -> (.., T, 1): transpose-route (see _unit_reshape)
        return jnp.swapaxes(x[..., None, :], -1, -2)
    T = x.shape[-1]
    src = jax.lax.broadcasted_iota(jnp.int32, (T, C), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, C), 1)
    parts = []
    for i in range(R):
        Q = (src == i * C + lane).astype(x.dtype)  # (T, C)
        piece = jnp.sum(x[..., :, None] * Q, axis=-2)  # (..., C)
        parts.append(piece[..., None, :])
    return jnp.concatenate(parts, axis=-2)


def _unit_reshape(x, new_sizes):
    """Stripped-equal reshape where the minor-most dim CHANGES (e.g.
    (L,) -> (L, 1)): in Mosaic layout terms that is a lane<->sublane
    TRANSPOSE, not a trivial reshape.  Route through unit inserts at -2
    (minor dim preserved — trivial) + swapaxes (supported relayout)."""
    stripped = _strip_units(new_sizes)
    if not stripped:  # all-unit target; scalars reshape trivially
        return jax.lax.reshape(x, new_sizes)
    # 1) strip x down to `stripped`
    while x.ndim > len(stripped):
        d = next(i for i, s in enumerate(x.shape) if s == 1)
        if d == x.ndim - 1 and x.ndim >= 2:
            x = jnp.swapaxes(x, -1, -2)
            d = x.ndim - 2
        x = jax.lax.squeeze(x, (d,))
    # 2) insert units to reach new_sizes, left to right
    for i, s in enumerate(new_sizes):
        if x.ndim > i and x.shape[i] == s:
            continue
        assert s == 1, (x.shape, new_sizes)
        if i == len(new_sizes) - 1:
            x = x[..., None, :]  # unit at -2 (minor dim preserved)
            x = jnp.swapaxes(x, -1, -2)
        else:
            x = jax.lax.expand_dims(x, (i,))
    return x


def _reshape_safe(x, new_sizes):
    """Mosaic-safe reshape: pass through unit-dim-only changes that keep
    the minor-most dim, transpose-route those that do not, otherwise
    reconstruct via trailing-dim merges/splits over a shared prefix."""
    new_sizes = tuple(int(d) for d in new_sizes)
    if _strip_units(x.shape) == _strip_units(new_sizes):
        if (x.shape and new_sizes and x.shape[-1] == new_sizes[-1]):
            return jax.lax.reshape(x, new_sizes)  # layout-trivial
        return _unit_reshape(x, new_sizes)
    old, new = list(x.shape), list(new_sizes)
    # longest common leading prefix (kept as batch dims)
    p = 0
    while p < min(len(old), len(new)) and old[p] == new[p]:
        p += 1
    # guard: the trailing products must match (they do for a reshape)
    # merge x's trailing dims down to one
    while x.ndim > p + 1:
        x = _merge_last_two(x)
    if x.ndim == p:  # trailing part was empty: add a unit axis
        x = x[..., None]
    # split into the target trailing dims, left to right
    tail = new[p:]
    for i in range(len(tail) - 1):
        rest = 1
        for d in tail[i + 1:]:
            rest *= d
        x = _split_last(x, tail[i], rest)
    if not tail:  # target trailing empty (scalar-ish): drop unit axis
        x = jax.lax.squeeze(x, (x.ndim - 1,))
    return x


def _keep_as_dot(a, b, dimension_numbers):
    (lc, rc), (lb, rb) = dimension_numbers
    return (
        a.ndim == 2 and b.ndim == 2 and not lb and not rb
        and len(lc) == 1 and len(rc) == 1
    )


def _const_key(c):
    a = np.asarray(c)
    return (a.dtype.str, a.shape, a.tobytes())


def _eval_rewritten(jaxpr, consts, *args, lookup=None):
    """Evaluate a jaxpr re-emitting its ops, with dot_generals that Mosaic
    cannot lower rewritten via ``_manual_dot``.  Recurses into scan / while /
    cond sub-jaxprs (fori_loop lowers to one of these) and pjit calls.

    ``lookup`` maps ``_const_key`` of a concrete const array to its traced
    kernel-input value: sub-jaxprs (e.g. lax.scan bodies) carry their OWN
    consts (model g-matrix literals etc.), which would otherwise become
    captured constants of the Pallas kernel.
    """
    from jax import lax as jlax
    from jax._src import core as jcore  # Literal/DropVar (no public home)

    def _resolve(cs):
        if lookup is None:
            return list(cs)
        out = []
        for c in cs:
            try:
                if np.ndim(c) > 0:
                    out.append(lookup.get(_const_key(c), c))
                else:
                    # concrete scalar: pass as a NumPy value so it embeds
                    # as a jaxpr literal — a 0-dim jax.Array would count as
                    # a captured constant of the enclosing Pallas kernel
                    out.append(np.asarray(c)[()])
                continue
            except Exception:  # traced value: leave as-is
                pass
            out.append(c)
        return out

    env = {}

    def read(v):
        return v.val if isinstance(v, jcore.Literal) else env[v]

    def write(v, val):
        env[v] = val

    for v, c in zip(jaxpr.constvars, consts):
        write(v, c)
    for v, a in zip(jaxpr.invars, args):
        write(v, a)

    for eqn in jaxpr.eqns:
        invals = [read(v) for v in eqn.invars]
        prim = eqn.primitive
        name = prim.name
        if name == "dot_general":
            a, b = invals
            dn = eqn.params["dimension_numbers"]
            pet = eqn.params.get("preferred_element_type")
            if _keep_as_dot(a, b, dn):
                out = prim.bind(*invals, **eqn.params)
            else:
                out = _manual_dot(a, b, dn, pet)
            outs = [out]
        elif name == "reshape" and eqn.params.get("dimensions") is None:
            outs = [_reshape_safe(invals[0], eqn.params["new_sizes"])]
        elif name == "concatenate" and invals[0].ndim == 1:
            # 1-D concats crossing the 128-lane tile boundary crash Mosaic;
            # the 2-D lane-concat form lowers fine (probed) — go through it.
            outs = [jax.lax.squeeze(
                jnp.concatenate([v[None, :] for v in invals], axis=1), (0,)
            )]
        elif name in ("reduce_sum", "reduce_max", "reduce_min",
                      "reduce_prod", "reduce_and", "reduce_or"):
            # Mosaic rejects reductions over non-trailing (sublane) axes
            # with rank-dropped outputs ("unsupported output implicit
            # dimension"); transpose the reduced axes to the end first.
            (x,) = invals
            axes = tuple(eqn.params["axes"])
            trailing = tuple(range(x.ndim - len(axes), x.ndim))
            if axes == trailing or x.ndim == len(axes):
                outs = [prim.bind(x, **eqn.params)]
            else:
                keep = [d for d in range(x.ndim) if d not in axes]
                xt = jnp.transpose(x, keep + list(axes))
                fn = dict(
                    reduce_sum=jnp.sum, reduce_max=jnp.max,
                    reduce_min=jnp.min, reduce_prod=jnp.prod,
                    reduce_and=jnp.all, reduce_or=jnp.any,
                )[name]
                outs = [fn(xt, axis=tuple(range(len(keep), x.ndim)))]
        elif name == "scan":
            # Mosaic's scan lowering rejects extensive (per-iteration)
            # inputs/outputs entirely — re-express as a fori_loop: xs rows
            # are selected with traced-index one-hot dots, ys rows are
            # accumulated into carried zero-init buffers with one-hot
            # writes.  (jax.linearize of a scan produces exactly such
            # extensive xs/ys: the stacked primal residuals.)
            p = eqn.params
            nc_, ncar = p["num_consts"], p["num_carry"]
            body = p["jaxpr"]  # ClosedJaxpr
            L_len = p["length"]
            reverse = p["reverse"]
            sconsts = invals[:nc_]
            init = list(invals[nc_:nc_ + ncar])
            xs = list(invals[nc_ + ncar:])
            # bool xs enter the loop body as f32 (see y_isbool below)
            xs_isbool = [a.dtype == jnp.bool_ for a in xs]
            xs = [
                a.astype(jnp.float32) if b else a
                for a, b in zip(xs, xs_isbool)
            ]
            n_ys = len(body.jaxpr.outvars) - ncar
            y_avals = [v.aval for v in body.jaxpr.outvars[ncar:]]
            # bool ys travel as f32 inside the loop carry: loop-carried
            # bools need an i8->i1 trunc on body entry, which Mosaic
            # cannot lower for vector shapes
            y_isbool = [av.dtype == jnp.bool_ for av in y_avals]
            y_bufs = [
                jnp.zeros((L_len,) + av.shape,
                          jnp.float32 if b else av.dtype)
                for av, b in zip(y_avals, y_isbool)
            ]

            def _sel_row(arr, t):
                """arr[t] with traced t, fresh layout."""
                if arr.ndim == 1:  # scalar pick via (1,L)@(L,1) dot
                    m2 = (jax.lax.broadcasted_iota(
                        jnp.int32, (L_len, 1), 0) == t).astype(jnp.float32)
                    val = jnp.dot(arr[None, :].astype(jnp.float32), m2,
                                  preferred_element_type=jnp.float32)[0, 0]
                    return val.astype(arr.dtype)
                mask = (jax.lax.broadcasted_iota(
                    jnp.int32, (L_len,) + (1,) * (arr.ndim - 1), 0
                ) == t)
                picked = jnp.where(mask, arr, jnp.zeros_like(arr))
                # reduce the leading (scan) axis as the TRAILING axis
                return jnp.sum(jnp.moveaxis(picked, 0, -1), axis=-1)

            def fbody(t, carry):
                cvars = list(carry[:ncar])
                bufs = list(carry[ncar:])
                idx_t = (L_len - 1 - t) if reverse else t
                x_t = [
                    (_sel_row(a, idx_t) > 0.5) if b
                    else _sel_row(a, idx_t)
                    for a, b in zip(xs, xs_isbool)
                ]
                outs_ = _eval_rewritten(
                    body.jaxpr, _resolve(body.consts),
                    *sconsts, *cvars, *x_t, lookup=lookup,
                )
                new_c = list(outs_[:ncar])
                ys_t = outs_[ncar:]
                new_bufs = []
                for buf, y, b in zip(bufs, ys_t, y_isbool):
                    if b:
                        y = y.astype(jnp.float32)
                    if buf.ndim == 1:
                        rows = _irange(L_len)
                        yb = y[None]
                    else:
                        rows = jax.lax.broadcasted_iota(
                            jnp.int32,
                            (L_len,) + (1,) * (buf.ndim - 1), 0,
                        )
                        yb = y[None, ...]
                    new_bufs.append(
                        buf + jnp.where(rows == idx_t, yb,
                                        jnp.zeros_like(buf))
                    )
                return tuple(new_c + new_bufs)

            final = jlax.fori_loop(0, L_len, fbody, tuple(init + y_bufs))
            outs = list(final[:ncar]) + [
                (y > 0.5) if b else y
                for y, b in zip(final[ncar:ncar + n_ys], y_isbool)
            ]
        elif name == "while":
            p = eqn.params
            cj, bj = p["cond_jaxpr"], p["body_jaxpr"]
            ncc, nbc = p["cond_nconsts"], p["body_nconsts"]
            cconsts = invals[:ncc]
            bconsts = invals[ncc:ncc + nbc]
            init = invals[ncc + nbc:]

            def wcond(carry, _cj=cj, _cc=tuple(cconsts)):
                return _eval_rewritten(
                    _cj.jaxpr, _resolve(_cj.consts), *_cc, *carry,
                    lookup=lookup,
                )[0]

            def wbody(carry, _bj=bj, _bc=tuple(bconsts)):
                return tuple(_eval_rewritten(
                    _bj.jaxpr, _resolve(_bj.consts), *_bc, *carry,
                    lookup=lookup,
                ))

            outs = list(jlax.while_loop(wcond, wbody, tuple(init)))
        elif name == "cond":
            p = eqn.params
            branches = p["branches"]
            idx, *ops = invals

            def mk(br):
                return lambda *a_: tuple(
                    _eval_rewritten(br.jaxpr, _resolve(br.consts), *a_,
                                    lookup=lookup)
                )

            outs = list(jlax.switch(idx, [mk(br) for br in branches], *ops))
        elif name in ("pjit", "jit", "closed_call", "custom_jvp_call",
                      "custom_vjp_call"):
            cj = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            outs = list(_eval_rewritten(cj.jaxpr, _resolve(cj.consts),
                                        *invals, lookup=lookup))
        else:
            out = prim.bind(*invals, **eqn.params)
            outs = out if prim.multiple_results else [out]
        for v, o in zip(eqn.outvars, outs):
            if not isinstance(v, jcore.DropVar):
                write(v, o)
    return [read(v) for v in jaxpr.outvars]


class _patched_trig:
    """Swap jnp.arctan2/arctan for Mosaic-lowerable polynomials while the
    algorithm is traced to a jaxpr (the SAME jaxpr runs in interpreter
    tests and on TPU, so numerics are identical across backends).

    The patch mutates the global jnp module, so a concurrent trace in
    another thread would silently pick up the polynomial approximation — a
    process-wide lock serializes patched sections against each other (the
    patched region is a one-time trace per lru-cached configuration, so
    contention is nil)."""

    _lock = __import__("threading").Lock()

    def __enter__(self):
        self._lock.acquire()
        self._orig2, self._orig1 = jnp.arctan2, jnp.arctan
        jnp.arctan2, jnp.arctan = mosaic_atan2, _mosaic_atan
        return self

    def __exit__(self, *exc):
        jnp.arctan2, jnp.arctan = self._orig2, self._orig1
        self._lock.release()
        return False


def _make_algorithm(model_name, spec_f, dt, cfg, dtype):
    """Build the pure per-problem solver function (plain arrays in/out).

    Constants that model code materializes mid-trace (e.g. a constant
    ``g``-matrix like DynamicUnicycle2D's) would be rejected by Pallas as
    captured kernel constants; the caller closure-converts this function so
    they become explicit kernel inputs instead.
    """
    model = get_model(model_name)
    n, m = model.N_STATES, model.N_CONTROLS
    N, K = cfg.horizon, cfg.num_obs
    M = N * m

    Qd, Rd = mpc_mod.mpc_weights(model_name)
    Qs = tuple(float(v) for v in np.sqrt(np.asarray(Qd)))
    Rs = tuple(float(v) for v in np.sqrt(np.asarray(Rd)))
    lbu = tuple(float(v) for v in np.asarray(model.u_lb(spec_f)))
    ubu = tuple(float(v) for v in np.asarray(model.u_ub(spec_f)))
    lb_x, ub_x = (np.asarray(b, np.float64) for b in model.state_bounds(spec_f))
    bounded_idx = tuple(
        int(i)
        for i in np.nonzero(np.isfinite(lb_x) | np.isfinite(ub_x))[0]
    )
    # Clamp infinite single-sided bounds to a large finite sentinel: the XLA
    # path carries inf rows (always satisfied); in the kernel a finite huge
    # bound keeps c finite for the merit arithmetic with the same active set.
    BIG = 1e6
    lb_xv = tuple(float(max(v, -BIG)) for v in lb_x)
    ub_xv = tuple(float(min(v, BIG)) for v in ub_x)

    alphas = (1.0, 0.5, 0.25, 0.1, 0.03, 0.0)
    noise_eps = 4.0 * float(jnp.finfo(dtype).eps)

    def algorithm(x0, goal, obs_flat, u_prev, U0_flat):
        obs = obs_flat.reshape(K, 7)
        U0 = U0_flat.reshape(N, m)

        qs_vec = _const_vec(Qs, dtype)
        rs_vec = _const_vec(Rs, dtype)
        lb_flat = _tiled_const_vec(lbu, N, dtype)
        ub_flat = _tiled_const_vec(ubu, N, dtype)

        # Mosaic layout discipline: stacked arrays are built by one-hot row
        # ACCUMULATION inside a lax.scan (fresh zero-offset values, jaxpr
        # size O(1) in N — a python-unrolled rollout made the VTOL N=30
        # kernel a 122k-eqn jaxpr and a >1 h Mosaic compile), and rows /
        # columns are extracted with iota-mask dots — never with array
        # slices like xs_full[1:] or xs[:, i], whose offset-carrying
        # layouts crash Mosaic's layout pass when they reach a concatenate.
        rows_n1 = jax.lax.broadcasted_iota(jnp.int32, (N + 1, 1), 0)
        _rN = jax.lax.broadcasted_iota(jnp.int32, (N, N + 1), 0)
        _cN = jax.lax.broadcasted_iota(jnp.int32, (N, N + 1), 1)
        Sh0 = (_cN == _rN).astype(dtype)      # picks rows 0..N-1 of (N+1, .)
        Sh1 = (_cN == _rN + 1).astype(dtype)  # picks rows 1..N

        def rollout(U):
            """(N+1, n) rollout via scan with one-hot row writes."""
            XS0 = x0[None, :] * (rows_n1 == 0).astype(dtype)

            def body(carry, inp):
                x, XS = carry
                u, k = inp
                x1 = model.step(x, u, spec_f, dt)
                XS = XS + x1[None, :] * (rows_n1 == k + 1).astype(dtype)
                return (x1, XS), None

            (_, XS), _ = jax.lax.scan(body, (x0, XS0), (U, _irange(N)))
            return XS

        def _col(mat, i):
            """mat[:, i] as a lane-mask reduction (fresh layout)."""
            lane = jax.lax.broadcasted_iota(jnp.int32, mat.shape, 1)
            return jnp.sum(jnp.where(lane == i, mat, 0.0), axis=-1)

        def _h_all(states):
            return jax.vmap(
                lambda xk: jax.vmap(
                    lambda o: hocbf_dt_h(model, model_name, xk, o, spec_f)
                )(obs)
            )(states)

        def rc_shared(U):
            """(residual, unscaled constraints) from ONE shared rollout —
            the same work-sharing as mpc_cbf.solve.constraints, expressed
            with shift-select dots instead of slices."""
            XS = rollout(U)  # (N+1, n)
            xs_k1 = jnp.dot(Sh1, XS, preferred_element_type=dtype)
            state_res = (xs_k1 - goal[None, :]) * qs_vec[None, :]
            du = U - jnp.concatenate([u_prev[None, :], U[:-1]], axis=0)
            input_res = du * rs_vec[None, :]
            r = jnp.concatenate([state_res.ravel(), input_res.ravel()])

            H = _h_all(XS)  # (N+1, K), shared between h_k and h_k1
            h_k = jnp.dot(Sh0, H, preferred_element_type=dtype)
            h_k1 = jnp.dot(Sh1, H, preferred_element_type=dtype)
            if model.REL_DEG == 1:
                cbf = (h_k1 - h_k) + spec_f.mpc_cbf_alpha * h_k
            else:
                x2 = jax.vmap(
                    lambda xk1, uk: model.step(xk1, uk, spec_f, dt)
                )(xs_k1, U)
                H2 = _h_all(x2)
                d_h = h_k1 - h_k
                dd_h = H2 - 2.0 * h_k1 + h_k
                a1, a2 = spec_f.mpc_cbf_alpha1, spec_f.mpc_cbf_alpha2
                cbf = dd_h + (a1 + a2) * d_h + a1 * a2 * h_k
            cons = [cbf.ravel()]
            for i in bounded_idx:
                col = _col(xs_k1, i)
                cons.append(ub_xv[i] - col)
                cons.append(col - lb_xv[i])
            return r, jnp.concatenate(cons)

        def residual(U):
            return rc_shared(U)[0]

        def constraints(U):
            return rc_shared(U)[1]

        Uf0 = jnp.clip(U0.ravel(), lb_flat, ub_flat)
        basis = jnp.eye(M, dtype=dtype)

        # constraint row scaling at the warm start (mpc_cbf.solve)
        _, jvp0 = jax.linearize(
            lambda Ufl: constraints(Ufl.reshape(N, m)), Uf0
        )
        Jc0 = jax.vmap(jvp0)(basis)  # (M, NC)
        c_scale = 1.0 / jnp.maximum(
            jnp.sqrt(jnp.sum(Jc0 * Jc0, axis=0)), 1e-2
        )

        n_con = c_scale.shape[0]

        def al_terms(U_flat, lam, rho):
            r, c_raw = rc_shared(U_flat.reshape(N, m))
            c = c_raw * c_scale
            act = jnp.maximum(0.0, lam - rho * c)
            return r, act

        # Cholesky + substitutions as fori_loops over masked column ops:
        # the column index is TRACED, so every row/column/scalar access is a
        # mask-reduction (Mosaic allows traced comparisons, not traced
        # gathers).  vs a python-unrolled version this cuts the kernel
        # jaxpr by ~M x, which is what keeps the M=120 Mosaic compile sane.
        idxM = _irange(M)
        _riota = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
        _ciota = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
        eyeM = (_riota == _ciota).astype(dtype)

        def _row(mat, j):
            """mat[j, :] with traced j (mask-reduction, fresh layout)."""
            return _sum_over_sublane(
                mat * (idxM == j).astype(dtype)[:, None]
            )

        _colM_iota = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)

        def _elem(vec, j):
            """vec[j] with traced j, via a (1,M)@(M,1) dot — Mosaic rejects
            the (1,M)->(1,) masked lane reduction this would otherwise be."""
            mask2 = (_colM_iota == j).astype(dtype)  # (M, 1)
            return jnp.dot(
                vec[None, :], mask2, preferred_element_type=dtype
            )[0, 0]

        def chol_masked(H):
            def col_step(j, L):
                Lj = _row(L, j)  # row j of L = column j of L^T
                Hcol = jnp.sum(
                    H * (idxM == j)[None, :].astype(dtype), axis=-1
                )  # H[:, j] (lane mask-reduction)
                v = Hcol - jnp.sum(L * Lj[None, :], axis=-1)
                # v = H[:, j] - L @ L[j, :]
                ljj = jnp.sqrt(jnp.maximum(_elem(v, j), 1e-20))
                colj = jnp.where(idxM >= j, v / ljj, 0.0)
                return L + colj[:, None] * (idxM == j)[None, :].astype(dtype)

            return jax.lax.fori_loop(0, M, col_step, jnp.zeros_like(H))

        def chol_solve(L, b):
            diag = jnp.sum(L * eyeM, axis=-1)  # (M,)

            def fwd(j, y):
                yj = _elem(y, j) / _elem(diag, j)
                colj = jnp.sum(L * (idxM == j)[None, :].astype(dtype),
                               axis=-1)  # L[:, j]
                y = jnp.where(idxM > j, y - yj * colj, y)
                return jnp.where(idxM == j, yj, y)

            y = jax.lax.fori_loop(0, M, fwd, b)

            def bwd(t, x):
                j = M - 1 - t
                xj = _elem(x, j) / _elem(diag, j)
                rowj = _row(L, j)  # L^T's column j is L's ROW j
                x = jnp.where(idxM < j, x - xj * rowj, x)
                return jnp.where(idxM == j, xj, x)

            return jax.lax.fori_loop(0, M, bwd, y)

        def newton_step(Uf, lam, rho):
            def rc(Ufl):
                r, c_raw = rc_shared(Ufl.reshape(N, m))
                return r, c_raw * c_scale

            (r0, c0), jvpf = jax.linearize(rc, Uf)
            Jr, Jc = jax.vmap(jvpf)(basis)  # (M, NR), (M, NC)
            act0 = jnp.maximum(0.0, lam - rho * c0)
            grad = 2.0 * jnp.dot(Jr, r0, preferred_element_type=dtype) - \
                jnp.dot(Jc, act0, preferred_element_type=dtype)
            active = (act0 > 0.0).astype(dtype)
            Jca = Jc * active[None, :]
            H = 2.0 * jnp.dot(Jr, Jr.T, preferred_element_type=dtype) + \
                rho * jnp.dot(Jca, Jca.T, preferred_element_type=dtype)
            idx = _irange(M)
            eye = eyeM
            tr = jnp.sum(H * eye)
            H = H + cfg.reg * eye * (1.0 + tr / M)

            eps_b = 1e-7
            at_lb = (Uf <= lb_flat + eps_b) & (grad > 0.0)
            at_ub = (Uf >= ub_flat - eps_b) & (grad < 0.0)
            free = jnp.logical_not(at_lb | at_ub).astype(dtype)
            # diag(1 - free) written as an eye-masked broadcast to stay 2-D
            Hf = free[:, None] * H * free[None, :] + eye * (1.0 - free)[None, :]
            gf = free * grad
            L = chol_masked(Hf)
            step = -chol_solve(L, gf)

            # merit deltas, cancellation-free (mpc_cbf.newton_step);
            # vmapped over the alphas (compact jaxpr — the rollout inside
            # merit_delta is traced once, batched by 6)
            base_cost = r0 @ r0 + (act0 @ act0) / (2.0 * rho)
            alphas_vec = _const_vec(alphas, dtype)

            def merit_delta(a):
                cand = jnp.clip(Uf + a * step, lb_flat, ub_flat)
                r_a, act_a = al_terms(cand, lam, rho)
                d_cost = (r_a - r0) @ (r_a + r0)
                d_pen = ((act_a - act0) @ (act_a + act0)) / (2.0 * rho)
                return d_cost + d_pen

            dvec = jax.vmap(merit_delta)(alphas_vec)
            dvec = jnp.where(jnp.isfinite(dvec), dvec, jnp.inf)
            best = jnp.argmin(dvec)
            noise_floor = noise_eps * base_cost
            pred = gf @ step + 0.5 * (step @ jnp.dot(
                Hf, step, preferred_element_type=dtype
            ))
            best = jnp.where(pred >= -noise_floor, 0, best)
            n_alpha = len(alphas)
            sel = (_irange(n_alpha) == best).astype(dtype)
            alpha = jnp.sum(alphas_vec * sel)
            return jnp.clip(Uf + alpha * step, lb_flat, ub_flat)

        def outer_body(_, carry):
            Uf, lam, rho = carry
            Uf = jax.lax.fori_loop(
                0, cfg.newton_iters, lambda _, u: newton_step(u, lam, rho), Uf
            )
            c = constraints(Uf.reshape(N, m)) * c_scale
            lam = jnp.maximum(0.0, lam - rho * c)
            rho = jnp.minimum(rho * cfg.rho_growth, cfg.rho_max)
            return (Uf, lam, rho)

        Uf, lam, _ = jax.lax.fori_loop(
            0, cfg.outer_iters, outer_body,
            (Uf0, jnp.zeros((n_con,), dtype), jnp.asarray(cfg.rho0, dtype)),
        )

        U = Uf.reshape(N, m)
        c = constraints(U) * c_scale
        viol = jnp.maximum(0.0, -jnp.min(c))
        return Uf, rollout(U).ravel(), viol

    return algorithm, (n, m, N, K, M)


@functools.lru_cache(maxsize=32)
def _get_solver(model_name, spec_leaves, dt, cfg, dtype_name, interpret):
    """Compile-cached batched solver for one static configuration.

    The whole builder runs under ``jax.ensure_compile_time_eval()``: on
    JAX 0.9 constants materialized inside an enclosing ``jax.jit`` trace
    are lifted to tracers, which would make every ``np.asarray`` on weights
    / bounds / jaxpr consts below throw ``TracerArrayConversionError`` when
    the caller (e.g. a jitted ``LocalTrackingController`` step) first
    reaches this cache miss.  Under the context manager those constants
    stay concrete regardless of the trace the builder happens to run in.
    """
    with jax.ensure_compile_time_eval():
        return _build_solver(
            model_name, spec_leaves, dt, cfg, dtype_name, interpret
        )


def _build_solver(model_name, spec_leaves, dt, cfg, dtype_name, interpret):
    dtype = jnp.dtype(dtype_name)
    # rebuild the concrete spec from its hashable leaves
    from safe_control_tpu.core import spec as spec_mod

    spec_f = spec_mod.make_spec(model_name)
    spec_f = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(spec_f), list(spec_leaves)
    )
    algorithm, (n, m, N, K, M) = _make_algorithm(
        model_name, spec_f, dt, cfg, dtype
    )

    # Hoist mid-trace constant ARRAYS (models materialize constant f/g
    # blocks, e.g. DynamicUnicycle2D's (4,2) input matrix) into explicit
    # kernel operands: Pallas rejects captured kernel constants.  These are
    # jaxpr literals, which jax.closure_convert does NOT extract — so trace
    # the algorithm to a jaxpr and turn its constvars into inputs directly.
    example = (
        jax.ShapeDtypeStruct((n,), dtype),
        jax.ShapeDtypeStruct((n,), dtype),
        jax.ShapeDtypeStruct((K * 7,), dtype),
        jax.ShapeDtypeStruct((m,), dtype),
        jax.ShapeDtypeStruct((M,), dtype),
    )
    with _patched_trig():
        closed = jax.make_jaxpr(algorithm)(*example)

    # Collect constant arrays RECURSIVELY (dedup by value): lax.scan /
    # while / cond bodies carry their OWN consts (model f/g literals,
    # masked_apply patterns, ...) which would otherwise surface as captured
    # Pallas constants when the interpreter evaluates the sub-jaxpr.
    uniq: dict = {}

    def _collect(jx, cs):
        for c in cs:
            a = np.asarray(c)
            if a.ndim == 0:
                continue  # scalars stay literals
            key = (a.dtype.str, a.shape, a.tobytes())
            if key not in uniq:
                uniq[key] = (len(uniq), a)
        for eqn in jx.eqns:
            for v in eqn.params.values():
                vs = v if isinstance(v, (list, tuple)) else [v]
                for b in vs:
                    if hasattr(b, "jaxpr") and hasattr(b, "consts"):
                        _collect(b.jaxpr, b.consts)

    _collect(closed.jaxpr, closed.consts)
    uniq_consts = [c for _, c in uniq.values()]
    const_shapes = [c.shape for c in uniq_consts]
    const_bool = [c.dtype == np.bool_ for c in uniq_consts]
    # bool consts travel as f32 and are reconstructed by comparison: the
    # i8 -> i1 truncation a bool kernel input would need has no Mosaic
    # lowering for vector shapes
    const_flat = [
        jnp.asarray(
            c.astype(np.float32) if b else c
        ).reshape(1, max(int(np.size(c)), 1))
        for c, b in zip(uniq_consts, const_bool)
    ]

    def kernel(*refs):
        # Full-array VMEM blocks + one-hot row selection: small trailing
        # dims (n, m, ...) violate Mosaic's (8, 128) block-divisibility rule
        # unless the block equals the whole array, and dynamic row slices
        # produce offset layouts that crash the Mosaic layout pass — a
        # one-hot multiply+reduce sidesteps both.
        i = pl.program_id(0)
        x0_ref, goal_ref, obs_ref, uprev_ref, u0_ref = refs[:5]
        const_refs = refs[5:5 + len(uniq_consts)]
        u_out, xs_out, viol_out = refs[5 + len(uniq_consts):]

        def take_row(ref):
            arr = ref[...]  # (B, d)
            rows = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 0)
            return _sum_over_sublane(jnp.where(rows == i, arr, 0.0))

        def put_row(ref, vec):
            arr = ref[...]
            rows = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 0)
            ref[...] = jnp.where(rows == i, vec[None, :], arr)

        cu = []
        for ref, shape, was_bool in zip(const_refs, const_shapes,
                                        const_bool):
            v = _reshape_safe(ref[...], shape) if shape else ref[0, 0]
            cu.append((v > 0.5) if was_bool else v)
        lookup = {key: cu[idx] for key, (idx, _) in uniq.items()}
        # scalar consts embed as NumPy literals (0-dim jax.Arrays would be
        # rejected as captured Pallas kernel constants)
        cvals = [
            lookup.get(_const_key(c), c) if np.ndim(c)
            else np.asarray(c)[()]
            for c in closed.consts
        ]
        # disable_jit: ops RE-EMITTED by the rewrite rules (jnp.remainder
        # etc. are inline-jitted) must not create fresh pjit sub-calls —
        # XLA's function dedup mis-binds same-named callees with different
        # operand types in this deeply-nested evaluation
        with jax.disable_jit():
            Uf, xs_flat, viol = _eval_rewritten(
                closed.jaxpr, cvals,
                take_row(x0_ref), take_row(goal_ref), take_row(obs_ref),
                take_row(uprev_ref), take_row(u0_ref),
                lookup=lookup,
            )
        put_row(u_out, Uf)
        put_row(xs_out, xs_flat)
        put_row(viol_out, viol[None])

    def solve_batch(xs, goals, obs, u_prevs, U_warm):
        B = xs.shape[0]
        # shift-by-one warm start, exactly like mpc_cbf.solve
        U0 = jnp.concatenate([U_warm[:, 1:], U_warm[:, -1:]], axis=1)
        grid = (B,)
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        U_t, xs_t, viol_t = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[full] * (5 + len(const_flat)),
            out_specs=(full, full, full),
            out_shape=(
                jax.ShapeDtypeStruct((B, M), dtype),
                jax.ShapeDtypeStruct((B, (N + 1) * n), dtype),
                jax.ShapeDtypeStruct((B, 1), dtype),
            ),
            interpret=interpret,
        )(
            xs, goals, obs.reshape(B, K * 7), u_prevs,
            U0.reshape(B, M), *const_flat,
        )
        U = U_t.reshape(B, N, m)
        return FusedResult(
            u=U[:, 0], U=U, xs=xs_t.reshape(B, N + 1, n), viol=viol_t[:, 0]
        )

    return jax.jit(solve_batch)


# Trace-time dispatch counter: incremented every time a fused solve is
# actually BUILT INTO a computation (once per trace; retraces bump it
# again).  Tests drive the jitted public wrapper and assert this moved —
# the regression it guards is a silent fall-through to the XLA path in
# ``mpc_cbf.solve_dispatch`` (round-4's headline bug).
DISPATCH_COUNT = 0


def solve_fused_batch(
    model_name, spec, xs, goals, obs, u_prevs, U_warm, dt,
    cfg: mpc_mod.MPCConfig, interpret: bool | None = None,
) -> FusedResult:
    """Batched fused MPC-CBF solve (one grid step per problem).

    ``spec`` must be concrete (floats / unjitted arrays) — the kernel
    closes over its values as scalars.  Raises if called with tracers.
    """
    global DISPATCH_COUNT
    DISPATCH_COUNT += 1
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    spec_f = _spec_statics(spec)
    leaves = tuple(jax.tree_util.tree_leaves(spec_f))
    solver = _get_solver(
        model_name, leaves, float(dt),
        cfg._replace(use_fused_kernel=False), jnp.dtype(xs.dtype).name,
        bool(interpret),
    )
    return solver(xs, goals, obs, u_prevs, U_warm)


def solve_fused_single(
    model_name, spec, x0, goal, obs, u_prev, mpc_state, dt,
    cfg: mpc_mod.MPCConfig, interpret: bool | None = None,
) -> mpc_mod.MPCResult:
    """Single-problem fused solve with ``mpc_cbf.solve``'s result contract
    (the latency path: one robot, one kernel launch, ~no HBM round trips).

    ``state.lam`` is reported as zeros — semantically equivalent because
    ``solve`` cold-starts the multipliers on entry (see its warm-start
    comment)."""
    res = solve_fused_batch(
        model_name, spec, x0[None], goal[None], obs[None], u_prev[None],
        mpc_state.U[None], dt, cfg, interpret=interpret,
    )
    return mpc_mod.MPCResult(
        u=res.u[0],
        state=mpc_mod.MPCState(U=res.U[0], lam=jnp.zeros_like(mpc_state.lam)),
        xs=res.xs[0],
        feasible=res.viol[0] <= cfg.viol_tol,
        viol=res.viol[0],
    )
