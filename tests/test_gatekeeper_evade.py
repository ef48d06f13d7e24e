"""Gatekeeper + MPS shielding tests on the evade scenario.

Reproduces examples/evade/test_evade.py: a DoubleIntegrator2D robot runs
down a hallway toward a goal while a "bullet bill" sweeps through; the
gatekeeper must commit to the evade-to-pocket backup in time.  Pass
criterion (test_evade.py:537-542): goal reached AND no collision.
"""

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_tpu.core.spec import DOUBLE_INTEGRATOR_2D, make_spec
from safe_control_tpu.dynamics import get_model
from safe_control_tpu.envs.evade_env import EvadeEnv
from safe_control_tpu.shielding import backup as backup_mod
from safe_control_tpu.shielding import gatekeeper as gk

DT = 0.1
ENV = EvadeEnv(
    hallway_length=60.0,
    hallway_width=4.0,
    pocket_x=25.0,
    pocket_length=10.0,
    pocket_width=4.0,
    goal_length=5.0,
    bullet_speed=3.0,
    bullet_width=4.0,
    bullet_length=3.0,
    bullet_start_x=-10.0,
)
SPEC = make_spec(DOUBLE_INTEGRATOR_2D, radius=0.5, a_max=2.0, v_max=1.5)
MODEL = get_model(DOUBLE_INTEGRATOR_2D)
SAFETY_MARGIN = 0.5

EVADE_CFG = backup_mod.EvadeConfig(
    pocket_center=ENV.pocket_center,
    pocket_x_min=ENV.pocket_x_min,
    pocket_x_max=ENV.pocket_x_max,
    pocket_y_min=ENV.pocket_y_min,
    pocket_y_max=ENV.pocket_y_max,
    goal_x_min=ENV.goal_x_min,
    goal_x_max=ENV.goal_x_max,
    goal_y_min=-ENV.half_width,
    goal_y_max=ENV.half_width,
    has_goal=True,
)


def nominal_policy(x):
    """Center-line PD controller (test_evade.py:130-168)."""
    target_vx, kp_y, kd = SPEC.v_max, 2.0, 2.0
    ax = kd * (target_vx - x[2])
    ay = kp_y * (0.0 - x[1]) + kd * (0.0 - x[3])
    a = jnp.array([ax, ay])
    mag = jnp.linalg.norm(a)
    return a * jnp.where(mag > SPEC.a_max, SPEC.a_max / jnp.maximum(mag, 1e-9), 1.0)


def backup_policy(x):
    return backup_mod.evade(x, EVADE_CFG, SPEC)


def _run(algo: str, initial_x=20.0, tf=60.0):
    cfg = gk.GatekeeperConfig(
        model_name=DOUBLE_INTEGRATOR_2D,
        dt=DT,
        nominal_steps=int(10.0 / DT),
        backup_steps=int(12.0 / DT),
        event_offset_steps=1,
        discount_steps=5,
        mps_mode=(algo == "mps"),
    )
    gstate = gk.init_state(cfg)

    @jax.jit
    def sim_step(gstate, x, bullet_x):
        def collision_fn(state_vec, t_idx):
            pos = state_vec[:2]
            # boundary (base radius) + bullet with safety margin, bullet
            # predicted at constant velocity (test_evade.py:373-383)
            b_x = bullet_x + ENV.bullet_speed * t_idx * DT
            return ENV.check_collision(pos, SPEC.radius) | ENV.check_bullet_collision(
                pos, SPEC.radius + SAFETY_MARGIN, b_x
            )

        out = gk.step(
            cfg, SPEC, gstate, x, backup_policy, collision_fn,
            nominal_policy=nominal_policy,
        )
        x_next = MODEL.step(x, out.u, SPEC, DT)
        return out.state, x_next, out.u, out.using_backup

    x = jnp.array([initial_x, 0.0, 0.0, 0.0])
    bullet_x = ENV.bullet_start_x
    collided = goal = False
    backup_steps = nominal_steps = 0
    for k in range(int(tf / DT)):
        gstate, x, u, using_backup = sim_step(gstate, x, jnp.asarray(bullet_x))
        if bool(using_backup):
            backup_steps += 1
        else:
            nominal_steps += 1
        bullet_x += ENV.bullet_speed * DT
        if bullet_x > ENV.hallway_length + ENV.bullet_length:
            bullet_x = ENV.bullet_start_x  # respawn (:375-379)
        pos = np.asarray(x[:2])
        if bool(ENV.check_bullet_collision(jnp.asarray(pos), SPEC.radius, jnp.asarray(bullet_x))):
            collided = True
            break
        if bool(ENV.check_goal_reached(jnp.asarray(pos))):
            goal = True
            break
    return dict(
        collided=collided,
        goal=goal,
        pos=np.asarray(x[:2]),
        backup_steps=backup_steps,
        nominal_steps=nominal_steps,
    )


def test_gatekeeper_evades_and_reaches_goal():
    r = _run("gatekeeper")
    assert not r["collided"], f"collision at {r['pos']}"
    assert r["goal"], f"goal not reached, pos {r['pos']} (backup {r['backup_steps']})"
    # The bullet passes at least once: the backup must have been engaged.
    assert r["backup_steps"] > 0


def test_mps_evades_without_collision():
    r = _run("mps")
    assert not r["collided"], f"collision at {r['pos']}"
    # MPS is more conservative; goal may take longer but safety must hold.


def test_backup_policy_reaches_pocket():
    """The evade backup alone must drive the robot into the pocket."""
    x = jnp.array([26.0, 0.0, 1.0, 0.0])
    for _ in range(200):
        x = MODEL.step(x, backup_policy(x), SPEC, DT)
    assert bool(ENV.is_in_safe_pocket(x[:2], margin=0.2)), np.asarray(x)


def test_evade_env_collision_semantics():
    env = ENV
    # hallway center is free
    assert not bool(env.check_collision(jnp.array([10.0, 0.0]), 0.5))
    # top wall outside pocket
    assert bool(env.check_collision(jnp.array([10.0, 2.2]), 0.5))
    # inside pocket is free
    assert not bool(env.check_collision(jnp.array([30.0, 3.0]), 0.5))
    # pocket ceiling
    assert bool(env.check_collision(jnp.array([30.0, 6.2]), 0.5))
    # bullet hitbox incl. nose
    assert bool(env.check_bullet_collision(jnp.array([12.3, 0.0]), 0.5, 10.0))
    assert not bool(env.check_bullet_collision(jnp.array([13.5, 0.0]), 0.5, 10.0))
