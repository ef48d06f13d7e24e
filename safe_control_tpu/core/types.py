"""Core array types and helpers.

Obstacles use the reference's 7-vector encoding (README.md:126-141,
tracking.py:428-443): ``[ox, oy, r_or_a, b_or_vx, e_or_vy, theta, flag]``
with flag 0 = circle (cols 3:5 double as vx, vy for dynamic obstacles) and
flag 1 = superellipsoid (a, b, e, theta).

Instead of Python lists of variable length, every obstacle set is a fixed-size
``(K, 7)`` array padded with "dummy" obstacles far away at (1000, 1000) — the
exact padding scheme the reference already uses for its MPC time-varying
parameters (position_control/mpc_cbf.py:272-282).
"""

from __future__ import annotations

import jax.numpy as jnp

OBS_DIM = 7
DUMMY_OBS_POS = 1000.0

# Obstacle column indices.
OBS_X, OBS_Y, OBS_R, OBS_B, OBS_E, OBS_THETA, OBS_FLAG = range(7)
# Dynamic-obstacle aliases (circle obstacles reuse cols 3:5 as velocity,
# dynamic_env/main.py:54-58).
OBS_VX, OBS_VY = 3, 4

FLAG_CIRCLE = 0.0
FLAG_SUPERELLIPSOID = 1.0


def dummy_obstacle(dtype=jnp.float32) -> jnp.ndarray:
    """A single far-away dummy obstacle row (mpc_cbf.py:272)."""
    return jnp.array([DUMMY_OBS_POS, DUMMY_OBS_POS, 0, 0, 0, 0, 0], dtype=dtype)


def pad_obstacles(obs, num_obs: int, dtype=jnp.float32) -> jnp.ndarray:
    """Pad/truncate an ``(n, <=7)`` obstacle array to fixed shape ``(num_obs, 7)``.

    Mirrors mpc_cbf.py:338-364 (update_tvp): rows with fewer than 7 columns are
    zero-extended, missing rows become dummy obstacles at (1000, 1000).
    """
    obs = jnp.asarray(obs, dtype=dtype)
    if obs.size == 0:
        obs = jnp.zeros((0, OBS_DIM), dtype=dtype)
    if obs.ndim == 1:
        obs = obs[None, :]
    n, d = obs.shape
    if d < OBS_DIM:
        obs = jnp.concatenate([obs, jnp.zeros((n, OBS_DIM - d), dtype=dtype)], axis=1)
    elif d > OBS_DIM:
        obs = obs[:, :OBS_DIM]
    if n >= num_obs:
        return obs[:num_obs]
    pad = jnp.tile(dummy_obstacle(dtype), (num_obs - n, 1))
    return jnp.concatenate([obs, pad], axis=0)


def is_dummy(obs: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask of padded dummy rows for a ``(..., 7)`` obstacle array."""
    return obs[..., OBS_X] >= DUMMY_OBS_POS - 1.0


def angle_normalize(x):
    """Wrap angle(s) into [-pi, pi) (dynamic_unicycle2D.py:13-21)."""
    return jnp.mod(x + jnp.pi, 2 * jnp.pi) - jnp.pi
