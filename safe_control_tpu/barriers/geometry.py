"""Barrier value functions h(x).

One scalar function per obstacle geometry; gradients come from ``jax.grad``
(replacing the reference's hand-derived expressions, e.g.
double_integrator2D.py:197-217, dynamic_unicycle2D.py:161-183).

Obstacle encoding is the reference 7-vector (core/types.py).  All functions
are written for a single (position, obstacle) pair and ``vmap``-ed by callers.
Both the circle and superellipsoid branches are always evaluated under
``jnp.where`` — the superellipsoid branch carries the same numeric guards as
the reference's CasADi graph (single_integrator2D.py:163-180) so dummy/circle
rows can't produce NaNs in values or gradients.
"""

from __future__ import annotations

import jax.numpy as jnp

from safe_control_tpu.core.types import (
    OBS_B,
    OBS_E,
    OBS_FLAG,
    OBS_R,
    OBS_THETA,
    OBS_X,
    OBS_Y,
)


def h_circle(p, obs, robot_radius, beta=1.01):
    """h = ||p - o||^2 - beta * d_min^2 (dynamic_unicycle2D.py:194-201)."""
    d_min = obs[OBS_R] + robot_radius
    diff = p - obs[OBS_X : OBS_Y + 1]
    return diff @ diff - beta * d_min**2


def h_superellipsoid(p, obs, robot_radius):
    """Superellipsoid barrier (dynamic_unicycle2D.py:204-220).

    h = |px'/(a+r)|^e + |py'/(b+r)|^e - 1 in the obstacle frame, with the
    reference's guards a,b >= 1e-3, e >= 2 so the branch stays finite when the
    row actually encodes a circle or a dummy obstacle.
    """
    a = jnp.maximum(jnp.abs(obs[OBS_R]), 1e-3)
    b = jnp.maximum(jnp.abs(obs[OBS_B]), 1e-3)
    e = jnp.maximum(jnp.abs(obs[OBS_E]), 2.0)
    theta = obs[OBS_THETA]
    ct, st = jnp.cos(theta), jnp.sin(theta)
    dx = p[0] - obs[OBS_X]
    dy = p[1] - obs[OBS_Y]
    px = ct * dx + st * dy
    py = -st * dx + ct * dy
    return (
        jnp.power(jnp.abs(px) / (a + robot_radius), e)
        + jnp.power(jnp.abs(py) / (b + robot_radius), e)
        - 1.0
    )


def h_point(p, obs, robot_radius, beta=1.01):
    """Flag-dispatched barrier for a point robot (circle vs superellipsoid)."""
    is_circle = obs[OBS_FLAG] < 0.5
    return jnp.where(
        is_circle,
        h_circle(p, obs, robot_radius, beta),
        h_superellipsoid(p, obs, robot_radius),
    )
