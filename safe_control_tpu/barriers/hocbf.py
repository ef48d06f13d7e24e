"""HOCBF composition via automatic differentiation.

The reference implements, per model, (a) continuous-time barriers with
hand-derived analytic gradients (``agent_barrier``) used by the CBF-QP
(cbf_qp.py:155-183), and (b) discrete-time barriers built by rolling the
dynamics forward symbolically in CasADi (``agent_barrier_dt``) used by
MPC-CBF (mpc_cbf.py:308-325).  Here both collapse into one ``h(x)`` per
model + ``jax.grad`` / the model's ``step``:

- relative degree 1:  row  A = ∇h·g,  b = ∇h·f + α h
- relative degree 2:  hdot(x) ≜ ∇h(x)·f(x)   (drift-only, exactly the
  reference's convention even when L_g h ≠ 0, kinematic_bicycle2D.py:168),
  row  A = ∇hdot·g,  b = ∇hdot·f + (α1+α2) hdot + α1 α2 h
- 'hard' mode rows (cbf_qp.py:137-177) use h/dt (r=1) or h/dt² + 2·hdot/dt.

Discrete (MPC) variant: h_k, Δh = h(x₁)−h(x₀), ΔΔh = h(x₂)−2h(x₁)+h(x₀)
with x₁ = step(x₀,u), x₂ = step(x₁,u) (dynamic_unicycle2D.py:188-238).
"""

from __future__ import annotations

from types import ModuleType

import jax
import jax.numpy as jnp

from safe_control_tpu.barriers import geometry
from safe_control_tpu.core import spec as spec_mod
from safe_control_tpu.dynamics import unicycle2d


def ct_h(model: ModuleType, model_name: str, x, obs, spec):
    """Continuous-time barrier value h(x) for one obstacle.

    Model-specific shapes: Unicycle2D subtracts the heading sigmoid
    (unicycle2D.py:107-125); all currently-registered models act on the 2-D
    position.  C3BF/DPCBF variants register their own ``ct_h`` overrides.
    """
    if hasattr(model, "ct_h"):
        return model.ct_h(x, obs, spec)
    p = model.barrier_pos(x)
    h = geometry.h_point(p, obs, spec.radius, spec.cbf_beta)
    if model_name == spec_mod.UNICYCLE_2D:
        heading = jnp.array([jnp.cos(x[2]), jnp.sin(x[2])])
        s = (p - obs[:2]) @ heading
        h = h - unicycle2d.sigma(s)
    return h


def dt_h(model: ModuleType, model_name: str, x, obs, spec):
    """Discrete-time barrier value (used inside the MPC rollout).

    The reference's dt barrier for Unicycle2D is the plain circle (no sigmoid,
    unicycle2D.py:127-146); others switch circle/superellipsoid via the flag.
    """
    if hasattr(model, "dt_h"):
        return model.dt_h(x, obs, spec)
    p = model.barrier_pos(x)
    if model_name == spec_mod.UNICYCLE_2D:
        return geometry.h_circle(p, obs, spec.radius, spec.cbf_beta)
    return geometry.h_point(p, obs, spec.radius, spec.cbf_beta)


def ct_cbf_row(model: ModuleType, model_name: str, x, obs, spec, dt, mode="cbf"):
    """One continuous-time CBF-QP constraint row (A_row, b) for one obstacle.

    The QP constraint is A_row @ u + b >= 0 (cbf_qp.py:103, 155-183).
    """
    h_fn = lambda xx: ct_h(model, model_name, xx, obs, spec)
    f_x = model.f(x, spec)
    g_x = model.g(x, spec)

    if model.REL_DEG == 1:
        h, dh = jax.value_and_grad(h_fn)(x)
        a_row = dh @ g_x
        if mode == "hard":
            b = h / dt + dh @ f_x
        else:
            b = dh @ f_x + spec.cbf_alpha * h
        return a_row, b

    # Relative degree 2: hdot uses the drift only (reference convention).
    hdot_fn = lambda xx: jax.grad(h_fn)(xx) @ model.f(xx, spec)
    h = h_fn(x)
    hdot, dhd = jax.value_and_grad(hdot_fn)(x)
    a_row = dhd @ g_x
    if mode == "hard":
        b = h / dt**2 + 2.0 * hdot / dt + dhd @ f_x
    else:
        gamma1 = spec.cbf_alpha1 + spec.cbf_alpha2
        gamma2 = spec.cbf_alpha1 * spec.cbf_alpha2
        b = dhd @ f_x + gamma1 * hdot + gamma2 * h
    return a_row, b


def ct_cbf_rows_multi(model: ModuleType, x, obs, spec, dt, mode="cbf"):
    """Multi-row r=1 CBF constraint block for one obstacle.

    For models exposing ``ct_multi_h(x, obs, spec) -> (C,)`` (Manipulator2D's
    per-link sampled circles, manipulator2D.py:186-224): each component h_j
    yields a row A_j = grad h_j . g, b_j = grad h_j . f + alpha h_j, or the
    'hard' h(x_next) >= 0 form b_j = h_j/dt + grad h_j . f
    (cbf_qp.py:136-147).
    """
    h_fn = lambda xx: model.ct_multi_h(xx, obs, spec)
    h = h_fn(x)
    Jh = jax.jacfwd(h_fn)(x)  # (C, n)
    f_x = model.f(x, spec)
    g_x = model.g(x, spec)
    a_rows = Jh @ g_x
    if mode == "hard":
        b = h / dt + Jh @ f_x
    else:
        b = Jh @ f_x + spec.cbf_alpha * h
    return a_rows, b


def dt_hocbf_value(model: ModuleType, model_name: str, x, u, obs, spec, dt):
    """Discrete-time HOCBF constraint value (>= 0 required).

    r=1: Δh + α·h_k;  r=2: ΔΔh + (α1+α2)·Δh + α1·α2·h_k
    (mpc_cbf.py:308-325).
    """
    h_fn = lambda xx: dt_h(model, model_name, xx, obs, spec)
    h_k = h_fn(x)
    x1 = model.step(x, u, spec, dt)
    h_k1 = h_fn(x1)
    if model.REL_DEG == 1:
        return (h_k1 - h_k) + spec.mpc_cbf_alpha * h_k
    x2 = model.step(x1, u, spec, dt)
    h_k2 = h_fn(x2)
    d_h = h_k1 - h_k
    dd_h = h_k2 - 2.0 * h_k1 + h_k
    a1, a2 = spec.mpc_cbf_alpha1, spec.mpc_cbf_alpha2
    return dd_h + (a1 + a2) * d_h + a1 * a2 * h_k
