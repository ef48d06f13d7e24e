"""Host-side visualization: workspace rendering and trajectory replay.

The reference draws live matplotlib artists from inside every class
(SURVEY.md §1 Lx); here simulation runs on device and visualization is a
host-side *replay* of logged trajectory arrays — plot after (or during) the
run from pulled-back numpy data.

Mirrors utils/plotting.py (workspace + parametric superellipsoid patches,
:189-222) and utils/animation.py (frame PNGs -> ffmpeg mp4, :11-86).
"""

from __future__ import annotations

import os
import subprocess
from typing import Optional, Sequence

import numpy as np


class Plotting:
    """Workspace renderer (utils/plotting.py analog)."""

    def __init__(self, width=14.0, height=14.0, known_obs=()):
        self.width = width
        self.height = height
        self.known_obs = np.asarray(list(known_obs), dtype=float)

    def plot_grid(self, title: str = ""):
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        ax.set_xlim(0, self.width)
        ax.set_ylim(0, self.height)
        ax.set_aspect(1)
        ax.set_title(title)
        self.draw_obstacles(ax, self.known_obs)
        return ax, fig

    @staticmethod
    def draw_obstacles(ax, obs, color="k", alpha=0.4, skip_dynamic=True):
        """Circles + parametric superellipsoid patches (plotting.py:189-222).

        Dynamic circle rows (nonzero vx/vy in cols 3:5) are skipped when
        ``skip_dynamic`` (plotting.py:69-87) — they are drawn per-frame.
        """
        import matplotlib.pyplot as plt

        obs = np.atleast_2d(np.asarray(obs, dtype=float))
        for row in obs:
            if row.shape[0] < 3 or row[0] >= 999.0:
                continue
            flag = row[6] if row.shape[0] >= 7 else 0.0
            if flag >= 0.5 and row.shape[0] >= 6 and row[4] >= 2.0:
                ax.add_patch(
                    plt.Polygon(
                        superellipsoid_points(row), closed=True,
                        facecolor=color, alpha=alpha, edgecolor="black",
                    )
                )
            else:
                if skip_dynamic and row.shape[0] >= 5 and (row[3] != 0 or row[4] != 0):
                    continue
                ax.add_patch(
                    plt.Circle(row[:2], row[2], facecolor=color, alpha=alpha,
                               edgecolor="black")
                )

    @staticmethod
    def plot_trajectory(ax, xs, color="tab:blue", label: Optional[str] = None):
        xs = np.asarray(xs)
        ax.plot(xs[:, 0], xs[:, 1], color=color, lw=1.5, label=label)

    @staticmethod
    def plot_waypoints(ax, wps):
        wps = np.asarray(wps)
        ax.scatter(wps[:, 0], wps[:, 1], s=24, facecolors="g", edgecolors="g",
                   alpha=0.6, zorder=5)


def draw_fov_sector(ax, pos, yaw, spec, color="tab:blue", alpha=0.15, n=24):
    """Camera FoV wedge, the reference's per-frame FoV triangle
    (robots/robot.py:180-334, 646-649)."""
    import matplotlib.pyplot as plt

    pos = np.asarray(pos, dtype=float)
    half = float(spec.fov_angle) / 2.0
    ang = np.linspace(float(yaw) - half, float(yaw) + half, n)
    arc = np.column_stack(
        [pos[0] + float(spec.cam_range) * np.cos(ang),
         pos[1] + float(spec.cam_range) * np.sin(ang)]
    )
    pts = np.vstack([pos[None, :], arc])
    patch = plt.Polygon(pts, closed=True, facecolor=color, alpha=alpha,
                        edgecolor="none", zorder=1)
    ax.add_patch(patch)
    return patch


def _mask_image(ax, mask, grid_spec, color, alpha, zorder=0):
    from matplotlib.colors import ListedColormap

    m = np.asarray(mask, dtype=bool).T  # (nx, ny) ij -> imshow (row=y, col=x)
    img = np.ma.masked_where(~m, np.ones_like(m, dtype=float))
    return ax.imshow(
        img, origin="lower",
        extent=(0, grid_spec.width, 0, grid_spec.height),
        cmap=ListedColormap([color]), alpha=alpha, zorder=zorder,
        interpolation="nearest",
    )


def draw_footprint(ax, footprint, grid_spec, color="0.75", alpha=0.45):
    """Accumulated sensing footprint (robot.py:646-654: the shapely union of
    FoV triangles, here the occupancy-grid equivalent)."""
    return _mask_image(ax, footprint, grid_spec, color, alpha, zorder=0)


def draw_safety_area(ax, mask, grid_spec, color="tab:red", alpha=0.3):
    """Braking-distance safety area (robot.py:656-741: the velocity-aligned
    tube / decelerating arc, as the grid mask the tracker actually checks)."""
    return _mask_image(ax, mask, grid_spec, color, alpha, zorder=2)


def superellipsoid_points(row, n=64):
    """Parametric boundary of a superellipsoid row (plotting.py:189-222)."""
    ox, oy, a, b, e, th = row[:6]
    t = np.linspace(0, 2 * np.pi, n)
    ct, st = np.cos(t), np.sin(t)
    px = a * np.sign(ct) * np.abs(ct) ** (2.0 / e)
    py = b * np.sign(st) * np.abs(st) ** (2.0 / e)
    c, s = np.cos(th), np.sin(th)
    return np.column_stack([ox + c * px - s * py, oy + s * px + c * py])


class AnimationSaver:
    """Frame PNGs -> mp4 via ffmpeg (utils/animation.py:11-86)."""

    def __init__(self, output_dir="output/animations", framerate=30):
        self.output_dir = output_dir
        self.framerate = framerate
        self.idx = 0
        os.makedirs(output_dir, exist_ok=True)

    def save_frame(self, fig):
        fig.savefig(os.path.join(self.output_dir, f"t_step_{self.idx:04d}.png"), dpi=100)
        self.idx += 1

    def export_video(self, name="tracking.mp4", cleanup=True):
        out = os.path.join(self.output_dir, name)
        try:
            subprocess.call(
                [
                    "ffmpeg", "-y", "-framerate", str(self.framerate),
                    "-i", os.path.join(self.output_dir, "t_step_%04d.png"),
                    "-pix_fmt", "yuv420p", out,
                ]
            )
        except FileNotFoundError:
            # No ffmpeg on this host: fall back to an animated GIF via
            # Pillow (always present alongside matplotlib).
            from PIL import Image

            out = os.path.splitext(out)[0] + ".gif"
            frames = [
                Image.open(os.path.join(self.output_dir, f"t_step_{i:04d}.png"))
                for i in range(self.idx)
            ]
            if frames:
                frames[0].save(
                    out, save_all=True, append_images=frames[1:],
                    duration=int(1000 / self.framerate), loop=0,
                )
        if cleanup:
            for i in range(self.idx):
                p = os.path.join(self.output_dir, f"t_step_{i:04d}.png")
                if os.path.exists(p):
                    os.remove(p)
        return out
