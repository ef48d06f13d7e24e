"""Misc geometry/angle helpers (utils/utils.py analog)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from safe_control_tpu.core.types import angle_normalize  # noqa: F401 (re-export)


def fov_edge_points(pos, yaw, fov_angle, cam_range):
    """Left/right FoV boundary points (utils/utils.py FoV helper /
    robots/robot.py:836-851)."""
    al = yaw - fov_angle / 2.0
    ar = yaw + fov_angle / 2.0
    left = jnp.stack([pos[0] + cam_range * jnp.cos(al), pos[1] + cam_range * jnp.sin(al)])
    right = jnp.stack([pos[0] + cam_range * jnp.cos(ar), pos[1] + cam_range * jnp.sin(ar)])
    return left, right


def rect_to_superellipsoid(obs_rectangle, e, theta):
    """Rectangles [ox, oy, w, h] -> superellipsoid 7-vectors
    (utils/utils.py:199-207): a = w/2, b = h/2, flag = 1."""
    assert e >= 2, "e should be >= 2 for superellipsoid approximation"
    rows = []
    for (ox, oy, w, h) in np.asarray(obs_rectangle, dtype=float):
        rows.append([ox, oy, w / 2.0, h / 2.0, e, theta, 1.0])
    return np.array(rows)
