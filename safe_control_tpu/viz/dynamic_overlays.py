"""Dynamic-environment barrier visualizations.

Host-side analogs of dynamic_env/robot.py (BaseRobotDyn): collision-cone
overlays for C3BF (:23-122) and parabola overlays for DPCBF (:124-226),
drawn for the nearest obstacles from logged states.
"""

from __future__ import annotations

import numpy as np


def draw_collision_cone(ax, x, obs, robot_radius, beta=1.0, color="tab:red", alpha=0.25):
    """C3BF collision cone: the set of relative-velocity directions that
    lead into the inflated obstacle disc, apexed at the robot."""
    px, py = float(x[0]), float(x[1])
    ox, oy, r = float(obs[0]), float(obs[1]), float(obs[2])
    R = (r + robot_radius) * beta
    d = np.hypot(ox - px, oy - py)
    if d <= R:
        return
    half = np.arcsin(np.clip(R / d, -1.0, 1.0))
    base = np.arctan2(oy - py, ox - px)
    length = d
    t = np.linspace(base - half, base + half, 16)
    pts = np.vstack(
        [[px, py]]
        + [[px + length * np.cos(a), py + length * np.sin(a)] for a in t]
    )
    import matplotlib.pyplot as plt

    ax.add_patch(plt.Polygon(pts, closed=True, facecolor=color, alpha=alpha,
                             edgecolor="none"))


def draw_dpcbf_parabola(
    ax, x, obs, robot_radius, s=1.05, k_lambda=0.1, k_mu=0.5,
    color="tab:purple", alpha=0.6, half_width=3.0,
):
    """DPCBF h = v_x' + lambda v_y'^2 + mu = 0 boundary in the LoS frame,
    drawn in world coordinates around the obstacle."""
    px, py = float(x[0]), float(x[1])
    theta, v = float(x[2]), float(x[3])
    ox, oy, r = float(obs[0]), float(obs[1]), float(obs[2])
    vx_o = float(obs[3]) if len(obs) > 4 else 0.0
    vy_o = float(obs[4]) if len(obs) > 4 else 0.0
    ego = (r + robot_radius) * s
    p_rel = np.array([ox - px, oy - py])
    v_rel = np.array([vx_o - v * np.cos(theta), vy_o - v * np.sin(theta)])
    p_mag = np.linalg.norm(p_rel)
    v_mag = max(np.linalg.norm(v_rel), 1e-6)
    d_safe = max(p_mag**2 - ego**2, 1e-6)
    scale = np.sqrt(s**2 - 1.0) / ego
    lam = k_lambda * np.sqrt(d_safe) / v_mag * scale
    mu = k_mu * np.sqrt(d_safe) * scale
    # boundary in LoS frame: v_x' = -(lam v_y'^2 + mu)
    vy = np.linspace(-half_width, half_width, 48)
    vx = -(lam * vy**2 + mu)
    rot = np.arctan2(p_rel[1], p_rel[0])
    c, sn = np.cos(rot), np.sin(rot)
    # draw the level set anchored at the robot, scaled for display
    wx = px + c * vx - sn * vy
    wy = py + sn * vx + c * vy
    ax.plot(wx, wy, color=color, alpha=alpha, lw=1.2)
