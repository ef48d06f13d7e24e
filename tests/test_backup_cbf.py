"""BackupCBF tests: sensitivity exactness + evade-scenario safety filter."""

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_tpu.core.spec import DOUBLE_INTEGRATOR_2D, make_spec
from safe_control_tpu.dynamics import get_model
from safe_control_tpu.envs.evade_env import EvadeEnv
from safe_control_tpu.shielding import backup as bk
from safe_control_tpu.shielding import backup_cbf

DT = 0.1
ENV = EvadeEnv(
    hallway_length=60.0, hallway_width=4.0, pocket_x=25.0, pocket_length=10.0,
    pocket_width=4.0, goal_length=5.0, bullet_speed=3.0, bullet_width=4.0,
    bullet_length=3.0, bullet_start_x=-10.0,
)
SPEC = make_spec(DOUBLE_INTEGRATOR_2D, radius=0.5, a_max=2.0, v_max=1.5)
MODEL = get_model(DOUBLE_INTEGRATOR_2D)
EVADE_CFG = bk.EvadeConfig(
    pocket_center=ENV.pocket_center,
    pocket_x_min=ENV.pocket_x_min, pocket_x_max=ENV.pocket_x_max,
    pocket_y_min=ENV.pocket_y_min, pocket_y_max=ENV.pocket_y_max,
)


def backup_policy(x):
    return bk.evade(x, EVADE_CFG, SPEC)


def _h_safety_factory(bullet_x0):
    """Evade-style h_safety: min of boundary halfspaces + bullet distance
    (backup_cbf_qp.py:341-446), with smooth-enough pieces for jax.grad."""

    def h_safety(x, t):
        px, py = x[0], x[1]
        r = SPEC.radius
        hw = ENV.half_width
        hs = [
            py + hw - r,                    # bottom
            px - r,                         # left
            ENV.hallway_length - px - r,    # right
        ]
        in_pocket_x = (px >= ENV.pocket_x_min) & (px <= ENV.pocket_x_max)
        h_top = jnp.where(in_pocket_x, ENV.pocket_y_max - py - r, hw - py - r)
        hs.append(h_top)
        # bullet (rect signed distance, :427-444)
        bx = bullet_x0 + ENV.bullet_speed * t
        dx = jnp.maximum(jnp.abs(px - bx) - ENV.bullet_length * (1 + 1 / 3) / 2, 0.0)
        dy = jnp.maximum(jnp.abs(py - 0.0) - ENV.bullet_width / 2, 0.0)
        hs.append(jnp.sqrt(dx**2 + dy**2 + 1e-9) - r - 0.5)
        return jnp.min(jnp.stack(hs))

    return h_safety


def h_terminal(x):
    """Pocket membership + slow velocity (backup_cbf_qp.py:460-539)."""
    margin = SPEC.radius + 0.2
    hs = jnp.stack(
        [
            x[0] - ENV.pocket_x_min - margin,
            ENV.pocket_x_max - x[0] - margin,
            x[1] - ENV.pocket_y_min - margin,
            ENV.pocket_y_max - x[1] - margin,
            SPEC.v_max - jnp.sqrt(x[2] ** 2 + x[3] ** 2),
        ]
    )
    return jnp.min(hs)


def test_sensitivities_match_finite_difference():
    """The jacfwd sensitivity chain must match the reference's FD scheme."""
    cfg = backup_cbf.BackupCBFConfig(
        model_name=DOUBLE_INTEGRATOR_2D, dt=DT, backup_steps=10
    )
    x0 = np.array([22.0, 0.5, 1.0, 0.0], dtype=np.float32)

    res = backup_cbf.solve(
        cfg, SPEC, jnp.asarray(x0), jnp.zeros(2), backup_policy,
        _h_safety_factory(-10.0), h_terminal,
    )
    # FD re-derivation of phi at step 5 sensitivity: S = dphi_5/dx0
    def roll(x):
        x = jnp.asarray(x)
        for _ in range(5):
            x = MODEL.step(x, backup_policy(x), SPEC, DT)
        return x

    eps = 1e-3
    S_fd = np.zeros((4, 4))
    base = np.asarray(roll(x0))
    for j in range(4):
        xp = x0.copy()
        xp[j] += eps
        S_fd[:, j] = (np.asarray(roll(xp)) - base) / eps
    S_auto = np.asarray(jax.jacfwd(roll)(jnp.asarray(x0)))
    np.testing.assert_allclose(S_auto, S_fd, atol=5e-2)
    assert np.isfinite(np.asarray(res.u)).all()


def test_filter_inactive_far_from_danger():
    """Bullet far away, backup rollout fully safe: u ~ u_ref."""
    cfg = backup_cbf.BackupCBFConfig(
        model_name=DOUBLE_INTEGRATOR_2D, dt=DT, backup_steps=30
    )
    x0 = jnp.array([28.0, 0.0, 0.5, 0.0])
    u_ref = jnp.array([0.5, 0.1])
    res = backup_cbf.solve(
        cfg, SPEC, x0, u_ref, backup_policy, _h_safety_factory(-100.0), h_terminal,
    )
    assert float(res.h_min) > 0
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(u_ref), atol=5e-2)
    assert not bool(res.using_backup)


def test_closed_loop_evade_no_collision():
    """BackupCBF variant of the evade loop (SURVEY.md §3.3 'BackupCBF
    variant'): robot near the pocket as the bullet arrives must duck in."""
    cfg = backup_cbf.BackupCBFConfig(
        model_name=DOUBLE_INTEGRATOR_2D, dt=DT, backup_steps=60
    )

    @jax.jit
    def step(x, bullet_x):
        u_ref = jnp.array([0.5, 0.0])  # push toward goal
        res = backup_cbf.solve(
            cfg, SPEC, x, u_ref, backup_policy,
            _h_safety_factory(bullet_x), h_terminal,
        )
        return MODEL.step(x, res.u, SPEC, DT), res

    x = jnp.array([22.0, 0.0, 1.0, 0.0])
    bullet_x = 0.0
    collided = False
    for k in range(300):
        x, res = step(x, jnp.asarray(bullet_x, jnp.float32))
        bullet_x += ENV.bullet_speed * DT
        if bullet_x > ENV.hallway_length + ENV.bullet_length:
            bullet_x = ENV.bullet_start_x
        if bool(ENV.check_bullet_collision(x[:2], SPEC.radius, jnp.asarray(bullet_x))):
            collided = True
            break
    assert not collided, f"collision at {np.asarray(x[:2])}, bullet {bullet_x:.1f}"
