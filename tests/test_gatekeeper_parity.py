"""Commitment-sequence parity: gatekeeper/MPS vs an independent NumPy model.

Round-3 verdict item 4: the gatekeeper's solver behavior (commit decisions,
nominal-prefix lengths, backup usage, applied controls) was scenario-tested
but never numerically anchored.  This file re-implements the REFERENCE's
sequential semantics (/root/reference/shielding/gatekeeper.py:553-665 and
shielding/mps.py:59-166) in plain float64 NumPy — sequential backward search
over nominal lengths, first-valid commit, keep-previous-on-failure, control
emission by time index with raw-backup fallback — and drives both it and
``safe_control_tpu.shielding.gatekeeper`` through the same scripted scenario
(DoubleIntegrator2D heading to a goal, one constant-velocity obstacle
crossing its lane, so predictions are exact and the reference's soundness
assumptions hold).  The DECISION SEQUENCES must agree exactly; states and
controls to f32 tolerance.

The NumPy model is written from the reference's semantics, not from this
repo's vectorized implementation (candidate search there is a vmapped
argmax; here it is the reference's literal first-valid loop).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from safe_control_tpu.core.spec import DOUBLE_INTEGRATOR_2D, make_spec
from safe_control_tpu.dynamics import get_model
from safe_control_tpu.shielding import gatekeeper as gk_mod

DT = 0.1
SPEC = make_spec(DOUBLE_INTEGRATOR_2D, v_max=1.0, a_max=1.0)
MODEL = get_model(DOUBLE_INTEGRATOR_2D)
GOAL = np.array([8.0, 0.0])
ROBOT_R = 0.3
OBS_R = 0.4
MARGIN = 0.1
# obstacle crosses the robot's lane: starts right of the path, moving -y
OBS0 = np.array([4.0, 2.5])
OBS_V = np.array([0.0, -0.6])
N_STEPS = 120


# ---- f64 NumPy re-implementations of the model pieces ---------------------
def nominal_np(x, k_v=1.0, k_a=1.0, d_min=0.05):
    """DoubleIntegrator2D PD law (double_integrator2D.py:113-140)."""
    pos_err = GOAL - x[:2]
    pos_err = np.sign(pos_err) * np.maximum(np.abs(pos_err) - d_min, 0.0)
    v_des = k_v * pos_err
    vm = np.linalg.norm(v_des)
    if vm > 1.0:
        v_des *= 1.0 / vm
    a = k_a * (v_des - x[2:4])
    am = np.linalg.norm(a)
    if am > 1.0:
        a *= 1.0 / am
    return a


def backup_np(x):
    """Deadbeat brake, same law as the jnp policy below."""
    a = -x[2:4] / DT
    mag = np.linalg.norm(a)
    if mag > 1.0:
        a *= 1.0 / max(mag, 1e-9)
    return a


def step_np(x, u):
    """DI Euler + velocity clamp (double_integrator2D.py:79-107)."""
    x = x + np.array([x[2], x[3], u[0], u[1]]) * DT
    vm = np.linalg.norm(x[2:4])
    if vm > 1.0:
        x = x.copy()
        x[2:4] *= 1.0 / vm
    return x


def collide_np(x, t_idx):
    """Time-synchronized moving-obstacle check (gatekeeper.py:380-527)."""
    obs_t = OBS0 + OBS_V * (t_idx * DT)
    return np.linalg.norm(x[:2] - obs_t) < OBS_R + ROBOT_R + MARGIN


class RefGatekeeper:
    """The reference's sequential gatekeeper semantics, f64 NumPy."""

    def __init__(self, nn, nb, event_offset, discount, mps=False):
        self.nn, self.nb = nn, nb
        self.event_offset, self.discount = event_offset, discount
        self.mps = mps
        self.L = nn + nb + 1
        self.committed_u = None  # list of (2,) controls
        self.committed_valid = 0  # number of valid u rows
        self.time_idx = 0
        self.next_event_idx = 0
        self.nominal_committed = 0
        self.initialized = False

    def _rollout(self, x0, policy, n):
        xs, us = [np.asarray(x0, float)], []
        for _ in range(n):
            u = policy(xs[-1])
            us.append(u)
            xs.append(step_np(xs[-1], u))
        return xs, us

    def step(self, x, t_abs):
        # t_abs unused: collision times are offsets from 'now', as in the
        # repo implementation (the scenario shifts OBS0 outside).
        if not self.initialized:
            bx, bu = self._rollout(x, backup_np, self.nb)
            self.committed_u = bu + [np.zeros(2)] * (self.L - 1 - self.nb)
            self.committed_valid = self.nb
            self.time_idx = 0
            self.next_event_idx = 0
            self.nominal_committed = 0
            self.initialized = True

        event = self.time_idx >= self.next_event_idx
        found = False
        if event:
            nom_x, nom_u = self._rollout(x, nominal_np, self.nn)
            if self.mps:
                cand_lens = [min(1, self.nn)]
            else:
                n_cand = self.nn // self.discount + 2
                cand_lens = [max(self.nn - i * self.discount, 0)
                             for i in range(n_cand)]
            for length in cand_lens:  # sequential backward search (:589)
                # nominal prefix safe through step `length`
                if any(collide_np(nom_x[k], k) for k in range(length + 1)):
                    continue
                bx, bu = self._rollout(nom_x[length], backup_np, self.nb)
                if any(collide_np(bx[j], length + j)
                       for j in range(self.nb + 1)):
                    continue
                found = True
                new_u = nom_u[:length] + bu
                new_u = new_u + [np.zeros(2)] * (self.L - 1 - len(new_u))
                self.committed_u = new_u
                self.committed_valid = length + self.nb
                self.time_idx = 0
                self.next_event_idx = self.event_offset
                self.nominal_committed = length
                break
            if not found:  # keep previous commitment (:649-652)
                self.next_event_idx = self.time_idx + self.event_offset

        # emit (:654-665)
        if self.time_idx < self.L - 1 and self.time_idx < self.committed_valid:
            u = self.committed_u[self.time_idx]
        else:
            u = backup_np(x)
        using_backup = self.time_idx >= self.nominal_committed
        rec = dict(
            event=bool(event), found=bool(found),
            nominal_committed=int(self.nominal_committed),
            using_backup=bool(using_backup), u=np.asarray(u, float),
        )
        self.time_idx += 1
        return rec


def _run_repo(cfg):
    spec = SPEC
    obs0 = jnp.asarray(OBS0, jnp.float32)
    obs_v = jnp.asarray(OBS_V, jnp.float32)

    def backup_policy(x):
        a = -x[2:4] / DT
        mag = jnp.linalg.norm(a)
        return a * jnp.where(mag > 1.0, 1.0 / jnp.maximum(mag, 1e-9), 1.0)

    def nominal_policy(x):
        return MODEL.nominal_input(x, jnp.asarray(GOAL, jnp.float32), spec)

    @jax.jit
    def step_all(gst, x, t0):
        def collision_fn(xx, t_idx):
            t = (t0 + t_idx).astype(jnp.float32) * DT
            obs_t = obs0 + obs_v * t
            return jnp.linalg.norm(xx[:2] - obs_t) < OBS_R + ROBOT_R + MARGIN

        out = gk_mod.step(cfg, spec, gst, x, backup_policy, collision_fn,
                          nominal_policy=nominal_policy)
        x1 = MODEL.step(x, out.u, spec, DT)
        return out, x1

    gst = gk_mod.init_state(cfg)
    x = jnp.asarray([0.0, 0.0, 0.0, 0.0], jnp.float32)
    recs, xs = [], [np.asarray(x, float)]
    for k in range(N_STEPS):
        out, x1 = step_all(gst, x, jnp.asarray(k, jnp.int32))
        recs.append(dict(
            event=bool(out.event_fired), found=bool(out.candidate_found),
            nominal_committed=int(out.state.nominal_steps_committed),
            using_backup=bool(out.using_backup),
            u=np.asarray(out.u, float),
        ))
        gst, x = out.state, x1
        xs.append(np.asarray(x, float))
    return recs, np.stack(xs)


def _run_ref(nn, nb, eo, disc, mps=False):
    ref = RefGatekeeper(nn, nb, eo, disc, mps=mps)
    x = np.array([0.0, 0.0, 0.0, 0.0])
    recs, xs = [], [x.copy()]
    global OBS0
    obs_orig = OBS0.copy()
    try:
        for k in range(N_STEPS):
            OBS0 = obs_orig + np.asarray(OBS_V) * (k * DT)  # world advances
            rec = ref.step(x, k)
            recs.append(rec)
            x = step_np(x, rec["u"])
            xs.append(x.copy())
    finally:
        OBS0 = obs_orig
    return recs, np.stack(xs)


@pytest.mark.parametrize(
    "mps", [False, True], ids=["gatekeeper", "mps"]
)
def test_commitment_sequence_parity(mps):
    nn, nb, disc = 12, 12, 4
    eo = 1 if mps else 3
    cfg = gk_mod.GatekeeperConfig(
        model_name=DOUBLE_INTEGRATOR_2D, dt=DT, nominal_steps=nn,
        backup_steps=nb, event_offset_steps=eo, discount_steps=disc,
        mps_mode=mps,
    )
    recs_repo, xs_repo = _run_repo(cfg)
    recs_ref, xs_ref = _run_ref(nn, nb, eo, disc, mps=mps)

    # commitment DECISIONS must agree exactly, step by step
    n_commits = 0
    for k, (a, b) in enumerate(zip(recs_repo, recs_ref)):
        assert a["event"] == b["event"], (k, a, b)
        assert a["found"] == b["found"], (k, a, b)
        assert a["nominal_committed"] == b["nominal_committed"], (k, a, b)
        assert a["using_backup"] == b["using_backup"], (k, a, b)
        np.testing.assert_allclose(a["u"], b["u"], atol=2e-4,
                                   err_msg=f"step {k}")
        n_commits += int(a["found"])

    # trajectories agree to f32 closed-loop tolerance
    assert np.max(np.abs(xs_repo - xs_ref)) < 2e-3

    # the scenario is non-trivial: the obstacle forces at least one
    # shortened commitment (backward search actually engaged)
    lens = [r["nominal_committed"] for r in recs_ref if r["found"]]
    assert n_commits > 3
    assert min(lens) < nn, lens

    # and safe throughout
    for k, xrow in enumerate(xs_ref[:-1]):
        assert not collide_np_world(xrow, k), k


def collide_np_world(x, k):
    obs_t = OBS0 + OBS_V * (k * DT)
    return np.linalg.norm(x[:2] - obs_t) < OBS_R + ROBOT_R
