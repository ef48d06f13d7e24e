"""Per-model rigid-body rendering for trajectory replays.

Host-side matplotlib equivalents of the reference's ``render_rigid_body``
methods (kinematic_bicycle2D.py:201-233, dynamic_bicycle2D.py:442-478,
quad2D.py:208-215, vtol2D.py:500-550): body rectangles with steered wheels
for the bicycle family, a rotor-tipped bar for the planar quad, and a
fuselage+wing silhouette for the VTOL.  The reference mutates persistent
artists inside each robot class every frame; here each function draws one
pose onto an axis (replay style), so the sim stays host-free.
"""

from __future__ import annotations

import numpy as np


def _rect(ax, cx, cy, length, width, angle, **kw):
    from matplotlib.patches import Rectangle
    from matplotlib.transforms import Affine2D

    r = Rectangle(
        (-length / 2.0, -width / 2.0), length, width,
        **{"fill": kw.pop("fill", True), **kw},
    )
    r.set_transform(Affine2D().rotate(angle).translate(cx, cy) + ax.transData)
    ax.add_patch(r)
    return r


def draw_bicycle(ax, x, spec_like, beta=0.0, color="tab:blue", alpha=0.8):
    """Kinematic/dynamic bicycle body + steered front wheel
    (kinematic_bicycle2D.py:201-233).

    ``x`` = [px, py, theta, ...]; ``spec_like`` needs body_length/body_width/
    front_ax_dist/rear_ax_dist/wheel_base (a RobotSpec works).
    """
    px, py, theta = float(x[0]), float(x[1]), float(x[2])
    L = float(getattr(spec_like, "body_length", 0.6))
    W = float(getattr(spec_like, "body_width", 0.3))
    fa = float(getattr(spec_like, "front_ax_dist", 0.2))
    ra = float(getattr(spec_like, "rear_ax_dist", 0.2))
    wb = float(getattr(spec_like, "wheel_base", fa + ra))
    # slip angle -> steering angle (kinematic_bicycle2D.py:61-65)
    delta = np.arctan((wb / max(ra, 1e-6)) * np.tan(beta)) if ra > 0 else beta
    _rect(ax, px, py, L, W, theta, color=color, alpha=alpha * 0.5)
    wl, ww = 0.3 * L, 0.15 * W
    rx = px - ra * np.cos(theta)
    ry = py - ra * np.sin(theta)
    fx = px + fa * np.cos(theta)
    fy = py + fa * np.sin(theta)
    _rect(ax, rx, ry, wl, ww, theta, color="k", alpha=alpha)
    _rect(ax, fx, fy, wl, ww, theta + delta, color="k", alpha=alpha)


def draw_quad2d(ax, x, radius=0.25, color="tab:purple", alpha=0.8):
    """Planar quadrotor: tilted bar + rotor discs (quad2D.py:208-215)."""
    px, pz, th = float(x[0]), float(x[1]), float(x[2])
    arm = 1.2 * radius
    dx, dz = arm * np.cos(th), arm * np.sin(th)
    ax.plot([px - dx, px + dx], [pz - dz, pz + dz], color=color, lw=2, alpha=alpha)
    from matplotlib.patches import Circle

    for s in (-1, 1):
        ax.add_patch(
            Circle((px + s * dx, pz + s * dz), 0.25 * radius, color=color, alpha=alpha)
        )


def draw_vtol(ax, x, radius=0.6, color="tab:green", alpha=0.8):
    """VTOL silhouette: fuselage + wing + tail, pitched by x[2]
    (vtol2D.py:500-550)."""
    px, pz, th = float(x[0]), float(x[1]), float(x[2])
    c, s = np.cos(th), np.sin(th)
    R = np.array([[c, -s], [s, c]])
    fuselage = np.array([[-1.2, 0.0], [1.2, 0.0]]) * radius
    wing = np.array([[-0.35, 0.0], [0.35, 0.25]]) * radius
    tail = np.array([[-1.2, 0.0], [-1.45, 0.45]]) * radius
    for seg, lw in ((fuselage, 3), (wing, 2), (tail, 2)):
        pts = (R @ seg.T).T + np.array([px, pz])
        ax.plot(pts[:, 0], pts[:, 1], color=color, lw=lw, alpha=alpha)


def draw_unicycle(ax, x, radius=0.25, color="tab:orange", alpha=0.8):
    """Heading-marked disc (robots/robot.py body+arrow artists)."""
    from matplotlib.patches import Circle

    px, py, th = float(x[0]), float(x[1]), float(x[2])
    ax.add_patch(Circle((px, py), radius, color=color, alpha=alpha * 0.5))
    ax.plot(
        [px, px + radius * np.cos(th)], [py, py + radius * np.sin(th)],
        color="k", lw=1.5, alpha=alpha,
    )


def draw_trajectory_bodies(ax, xs, model_name, spec_like, every=20, us=None):
    """Overlay body shapes along a replayed trajectory every ``every`` steps."""
    xs = np.asarray(xs)
    for k in range(0, len(xs), every):
        x = xs[k]
        if model_name.startswith("KinematicBicycle") or model_name in (
            "DynamicBicycle2D", "DriftingCar",
        ):
            beta = float(us[k][1]) if us is not None else 0.0
            draw_bicycle(ax, x, spec_like, beta=beta)
        elif model_name == "Quad2D":
            draw_quad2d(ax, x, float(getattr(spec_like, "radius", 0.25)))
        elif model_name == "VTOL2D":
            draw_vtol(ax, x, float(getattr(spec_like, "radius", 0.6)))
        elif model_name in ("Unicycle2D", "DynamicUnicycle2D"):
            draw_unicycle(ax, x, float(getattr(spec_like, "radius", 0.25)))
