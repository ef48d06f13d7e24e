"""Warehouse case-study drivers: BackupCBF and gatekeeper shielding.

Reusable closed-loop harnesses over ``envs.warehouse_env.WarehouseEnv``
(the reference's PLCBF warehouse case study: backup_cbf_qp.py:390-446
h_safety building blocks + warehouse_env.py:24-266 leveled ghost traffic),
shared by ``tests/test_warehouse_e2e.py`` and ``examples/test_warehouse.py``.

Two strategies:

- ``run_backup_cbf_level``: BackupCBF + stop backup (the reference
  architecture).  Fast; but "braked to rest" is not invariant under
  corridor sweepers, so it survives only light traffic (level 1).
- ``run_gatekeeper_level``: gatekeeper commitments + evade-to-safe-spot
  backup, validated against BOUNCE-EXACT ghost predictions (the env
  reflects positions off the [2, 98] band, so the triangle-wave fold has
  zero model error at the sample times; ``GHOST_MARGIN`` covers only
  intra-sample relative motion) with a terminal invariant-set gate.
  Collision-free at every ghost level; trades liveness on routes whose
  waypoints sit inside sweeper lanes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_tpu.core.spec import DOUBLE_INTEGRATOR_2D, make_spec
from safe_control_tpu.dynamics import get_model
from safe_control_tpu.envs.warehouse_env import WarehouseEnv, fold_position
from safe_control_tpu.shielding import backup_cbf as bcbf
from safe_control_tpu.shielding import gatekeeper as gk

DT = 0.1
SPEC = make_spec(DOUBLE_INTEGRATOR_2D, v_max=3.0, a_max=3.0, ax_max=3.0,
                 ay_max=3.0, radius=0.8)
MODEL = get_model(DOUBLE_INTEGRATOR_2D)
R = float(SPEC.radius)
MAX_SPOTS = 1024
# Intra-sample guard: the fold prediction is exact AT the sample times
# (position-reflecting env bounces), so the only unmodeled motion is the
# dip between samples, ~(|v_ghost| + |v_robot|) * dt / 2 = (4+3)*0.1/2
# = 0.35 m worst case.
GHOST_MARGIN = 0.4

GK_CFG = gk.GatekeeperConfig(
    model_name=DOUBLE_INTEGRATOR_2D, dt=DT, nominal_steps=30, backup_steps=60,
    event_offset_steps=3, discount_steps=3,
)

_CTRL_CACHE: dict = {}


def _true_min_h(env, x):
    p = np.asarray(x[:2])
    d_static = np.min(
        np.linalg.norm(p - env.static_obstacles[:, :2], axis=1)
        - env.static_obstacles[:, 2]
    )
    g = np.asarray(env.ghosts)
    act = g[:, 4] > 0
    d_ghost = np.min(
        np.linalg.norm(p - g[act, :2], axis=1) - g[act, 4]
    ) if act.any() else np.inf
    return min(d_static - R, d_ghost - R)


def _make_bcbf_ctrl(env):
    """Jitted BackupCBF control step (stop backup); one compile serves every
    level (the ghost table is fixed-shape (MAX_GHOSTS, 5) at all levels)."""
    if "bcbf" in _CTRL_CACHE:
        return _CTRL_CACHE["bcbf"]
    static = jnp.asarray(env.static_obstacles, jnp.float32)

    def backup_policy(x):
        return jnp.clip(-2.0 * x[2:4], -3.0, 3.0)

    def h_safety_at(ghosts0):
        def h_safety(x, t):
            p = x[:2]
            h_bnd = jnp.min(jnp.array([
                p[0] - R, env.width - p[0] - R,
                p[1] - R, env.height - p[1] - R,
            ]))
            d_s = jnp.sqrt((p[0] - static[:, 0]) ** 2 + (p[1] - static[:, 1]) ** 2)
            h_static = jnp.min(d_s - R - static[:, 2])
            gx = ghosts0[:, 0] + ghosts0[:, 2] * t
            gy = ghosts0[:, 1] + ghosts0[:, 3] * t
            d_g = jnp.sqrt((p[0] - gx) ** 2 + (p[1] - gy) ** 2)
            h_ghost = jnp.min(
                jnp.where(ghosts0[:, 4] > 0, d_g - R - ghosts0[:, 4], jnp.inf)
            )
            return jnp.minimum(jnp.minimum(h_bnd, h_static), h_ghost)

        return h_safety

    cfg = bcbf.BackupCBFConfig(
        model_name=DOUBLE_INTEGRATOR_2D, dt=DT, backup_steps=25, alpha=1.5,
    )

    @jax.jit
    def ctrl(x, goal, ghosts0):
        u_ref = MODEL.nominal_input(x, goal, SPEC)
        h_s = h_safety_at(ghosts0)
        h_t = lambda xx: jnp.minimum(
            h_s(xx, cfg.backup_steps * DT), 1.0 - jnp.linalg.norm(xx[2:4]) / 0.5
        )
        return bcbf.solve(cfg, SPEC, x, u_ref, backup_policy, h_s, h_t)

    _CTRL_CACHE["bcbf"] = ctrl
    return ctrl


def run_backup_cbf_level(level, max_steps=1200, record=None):
    """BackupCBF zig-zag drive; dict(outcome='reached'|'collision'|'stalled',
    min_h, steps, min_rollout_h[, wp_i])."""
    env = WarehouseEnv(level=level, dt=DT)
    wps = env.get_nominal_waypoints()
    ctrl = _make_bcbf_ctrl(env)

    x = jnp.asarray([10.0, 10.0, 0.0, 0.0], jnp.float32)
    wp_i = 1  # waypoint 0 is the start
    min_h = np.inf
    min_rollout_h = np.inf
    for k in range(max_steps):
        res = ctrl(x, jnp.asarray(wps[wp_i], jnp.float32), env.ghosts)
        x = MODEL.step(x, res.u, SPEC, DT)
        env.step()
        if record is not None:
            record.append(np.asarray(x).copy())
        min_rollout_h = min(min_rollout_h, float(res.h_min))
        min_h = min(min_h, _true_min_h(env, x))
        if min_h < -0.05:
            return dict(outcome="collision", min_h=min_h, steps=k,
                        min_rollout_h=min_rollout_h, wp_i=wp_i)
        if np.linalg.norm(np.asarray(x[:2]) - wps[wp_i]) < 2.0:
            wp_i += 1
            if wp_i == len(wps):
                return dict(outcome="reached", min_h=min_h, steps=k,
                            min_rollout_h=min_rollout_h, wp_i=wp_i)
    return dict(outcome="stalled", min_h=min_h, steps=max_steps,
                min_rollout_h=min_rollout_h, wp_i=wp_i)


def run_gatekeeper_level(level, max_steps=1200, record=None):
    """Gatekeeper-shielded drive; dict(outcome, min_h, steps, backup_steps,
    wp_i)."""
    env = WarehouseEnv(level=level, dt=DT)
    wps = env.get_nominal_waypoints()
    static = jnp.asarray(env.static_obstacles, jnp.float32)
    sp = env.safe_spots(robot_radius=R)
    assert len(sp), f"no safe spots at level {level}"
    pad = np.tile(sp[-1:], (MAX_SPOTS - len(sp), 1))
    spots = jnp.asarray(np.vstack([sp, pad])[:MAX_SPOTS], jnp.float32)

    def backup_policy(x):
        # evade to the nearest ghost-path-free parking spot with mild
        # static repulsion (the reference's evade-to-pocket shape,
        # backup_controller.py:420-626)
        p, v = x[:2], x[2:4]
        d = jnp.linalg.norm(spots - p[None, :], axis=1)
        tgt = spots[jnp.argmin(d)]
        a = 2.0 * (tgt - p) - 2.8 * v
        diff = p[None, :] - static[:, :2]
        dist = jnp.linalg.norm(diff, axis=1)
        surf = dist - static[:, 2] - R
        rep = jnp.sum(
            diff / jnp.maximum(dist, 1e-6)[:, None]
            * (3.0 * jnp.maximum(1.0 - surf / 2.0, 0.0) ** 2)[:, None],
            axis=0,
        )
        a = a + rep
        mag = jnp.linalg.norm(a)
        return a * jnp.where(mag > 3.0, 3.0 / jnp.maximum(mag, 1e-9), 1.0)

    @jax.jit
    def step_all(gst, x, goal, g0):
        def nominal_policy(xx):
            return MODEL.nominal_input(xx, goal, SPEC)

        def collision_fn(xx, t_idx):
            p = xx[:2]
            t = jnp.asarray(t_idx, jnp.float32) * DT
            oob = (p[0] < R) | (p[0] > env.width - R) \
                | (p[1] < R) | (p[1] > env.height - R)
            d_s = jnp.linalg.norm(p[None, :] - static[:, :2], axis=1)
            hit_s = jnp.any(d_s < static[:, 2] + R + 0.15)

            # bounce-exact ghost prediction: the env reflects positions off
            # the [2, 98] band, so the triangle-wave fold has zero model
            # error at sample times (envs.warehouse_env.fold_position)
            gx = fold_position(g0[:, 0] + g0[:, 2] * t)
            gy = fold_position(g0[:, 1] + g0[:, 3] * t)
            d_g = jnp.sqrt((p[0] - gx) ** 2 + (p[1] - gy) ** 2)
            hit_g = jnp.any(
                (d_g < g0[:, 4] + R + GHOST_MARGIN) & (g0[:, 4] > 0)
            )
            return oob | hit_s | hit_g

        def terminal_fn(xx):
            # invariant set: parked (slow) at a ghost-path-free spot
            d = jnp.min(jnp.linalg.norm(spots - xx[:2][None, :], axis=1))
            return (d < 0.8) & (jnp.linalg.norm(xx[2:4]) < 0.3)

        out = gk.step(GK_CFG, SPEC, gst, x, backup_policy, collision_fn,
                      nominal_policy=nominal_policy, terminal_fn=terminal_fn)
        x1 = MODEL.step(x, out.u, SPEC, DT)
        return out.state, x1, out.using_backup

    gst = gk.init_state(GK_CFG)
    x = jnp.asarray([10.0, 10.0, 0.0, 0.0], jnp.float32)
    wp_i = 1
    min_h = np.inf
    bk_steps = 0
    for k in range(max_steps):
        gst, x, ub = step_all(gst, x, jnp.asarray(wps[wp_i], jnp.float32),
                              env.ghosts)
        env.step()
        if record is not None:
            record.append(np.asarray(x).copy())
        bk_steps += int(ub)
        min_h = min(min_h, _true_min_h(env, x))
        if min_h < -0.05:
            return dict(outcome="collision", min_h=float(min_h), steps=k,
                        backup_steps=bk_steps, wp_i=wp_i)
        if np.linalg.norm(np.asarray(x[:2]) - wps[wp_i]) < 4.0:
            wp_i += 1
            if wp_i == len(wps):
                return dict(outcome="reached", min_h=float(min_h), steps=k,
                            backup_steps=bk_steps, wp_i=wp_i)
    return dict(outcome="stalled", min_h=float(min_h), steps=max_steps,
                backup_steps=bk_steps, wp_i=wp_i)
