"""Round-4 parity gates: MPCC anchors + closed-loop configs 3-4.

Goldens in tests/data/parity_goldens_r4.npz (generator:
tests/data/gen_parity_goldens_r4.py — f64 SLSQP / exact active-set NumPy
re-implementations, same policy as the round-3 goldens).  These close the
round-3 verdict's parity-breadth item: the MPCC contouring optimum is now
numerically anchored (f64 accuracy gate + f32 envelope), and the
unknown-env (FoV-in-the-loop) and dynamic-obstacle C3BF/DPCBF configs have
closed-loop TRAJECTORY gates, not just single-step anchors.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_tpu.core.spec import (
    DYNAMIC_UNICYCLE_2D,
    DRIFTING_CAR,
    KINEMATIC_BICYCLE_2D_C3BF,
    KINEMATIC_BICYCLE_2D_DPCBF,
    make_spec,
)
from safe_control_tpu.core.types import pad_obstacles
from safe_control_tpu.dynamics import get_model
from safe_control_tpu.perception import fov as fov_mod
from safe_control_tpu.solvers import al_gn, cbf_qp, mpc_cbf, mpcc

DT = 0.05
DATA = np.load(
    os.path.join(os.path.dirname(__file__), "data", "parity_goldens_r4.npz")
)


# --------------------------- MPCC anchors ----------------------------------

ACCURACY_AL = al_gn.ALGNConfig(outer_iters=30, newton_iters=8)


def _run_mpcc_anchors(al_cfg, dtype):
    spec = make_spec(DRIFTING_CAR)
    pxy = DATA["mpcc_path_xy"]
    path = mpcc.Path(
        s=jnp.asarray(np.asarray(mpcc.make_path(pxy[:, 0], pxy[:, 1]).s),
                      dtype),
        x=jnp.asarray(pxy[:, 0], dtype),
        y=jnp.asarray(pxy[:, 1], dtype),
        theta=jnp.asarray(
            np.asarray(mpcc.make_path(pxy[:, 0], pxy[:, 1]).theta), dtype),
    )
    cfg = mpcc.MPCCConfig(horizon=30, v_ref=10.0, al=al_cfg)

    @jax.jit
    def solve_one(x8, psi, init, uprev):
        st0 = mpcc.init_state(cfg, dtype=dtype)
        st = mpcc.MPCCState(U=st0.U, psi=psi, initialized=init)
        return mpcc.solve(spec, x8, path, st, uprev, DT, cfg).u

    devs = []
    for x8, psi, init, uprev, gold in zip(
        DATA["mpcc_x8"], DATA["mpcc_psi"], DATA["mpcc_init"],
        DATA["mpcc_uprev"], DATA["mpcc_gold"],
    ):
        u = solve_one(
            jnp.asarray(x8, dtype), jnp.asarray(psi, dtype),
            jnp.asarray(bool(init)), jnp.asarray(uprev, dtype),
        )
        devs.append(np.max(np.abs(np.asarray(u, float) - gold)))
    return np.asarray(devs)


@pytest.mark.slow
def test_mpcc_anchors_reference_precision():
    """MPCC contouring optimum at the reference's solve precision (f64):
    applied [delta_dot, tau_dot] within 1e-3 of the f64-SLSQP KKT-point
    golden.  Certification scope (see gen_parity_goldens_r4.py): the golden
    is the f64 polish of the NLP at the anchor with a perturbed-start basin
    check — basin-level local optimality, the same guarantee class the
    reference's warm-started IPOPT provides (mpcc.py:213-220)."""
    with jax.enable_x64(True):
        devs = _run_mpcc_anchors(ACCURACY_AL, jnp.float64)
    assert devs.max() < 1e-3, f"mpcc f64 deviations {devs}"


@pytest.mark.slow
def test_mpcc_anchors_f32_envelope():
    """f32 shipping-budget envelope for the MPCC anchors (regression pin;
    bounds set from the measured distribution with ~3x guard)."""
    devs = _run_mpcc_anchors(al_gn.ALGNConfig(), jnp.float32)
    assert np.median(devs) < 3e-3, f"mpcc f32 median regressed: {devs}"
    assert devs.max() < 3e-2, f"mpcc f32 worst regressed: {devs}"


def test_mpcc_dropped_recorded():
    assert "mpcc_dropped" in DATA.files
    assert int(DATA["mpcc_dropped"]) <= len(DATA["mpcc_x8"])


# ------------------- closed-loop config 4 (C3BF / DPCBF) -------------------


@pytest.mark.slow
@pytest.mark.parametrize(
    "tag,model_name",
    [("cl4c", KINEMATIC_BICYCLE_2D_C3BF), ("cl4d", KINEMATIC_BICYCLE_2D_DPCBF)],
)
def test_closed_loop_config4(tag, model_name):
    """f32 closed loop (CBF-QP each step, constant-velocity obstacle) vs
    the f64 exact-active-set golden trajectory."""
    spec = make_spec(model_name)
    model = get_model(model_name)
    gold = DATA[f"{tag}_traj"]
    goal = jnp.asarray(np.concatenate([DATA[f"{tag}_goal"], [0.0, 0.0]]),
                       jnp.float32)

    @jax.jit
    def step_once(x, obs_row):
        u_ref = model.nominal_input(x, goal, spec)
        obs = pad_obstacles(obs_row[None], 5)
        r = cbf_qp.solve(model_name, spec, x, u_ref, obs, DT)
        return model.step(x, r.u, spec, DT)

    x = jnp.asarray(DATA[f"{tag}_x0"], jnp.float32)
    obs_row = np.asarray(DATA[f"{tag}_obs0"], float)
    dev = 0.0
    for k in range(gold.shape[0] - 1):
        x = step_once(x, jnp.asarray(obs_row, jnp.float32))
        obs_row[:2] += obs_row[3:5] * DT
        dev = max(dev, float(np.max(np.abs(
            np.asarray(x[:2]) - gold[k + 1, :2]))))
    assert dev < 5e-3, f"{tag} closed-loop position deviation {dev}"


# ---------------- closed-loop config 3 (FoV unknown env) -------------------


@pytest.mark.slow
def test_closed_loop_config3_unknown_env():
    """f32 closed loop with FoV detection + persistent memory in the loop
    (the BASELINE config-3 pipeline end to end) vs the f64 NumPy golden
    whose detection/memory/solver are all independent re-implementations."""
    spec = make_spec(DYNAMIC_UNICYCLE_2D, a_max=1.0, w_max=0.5)
    model = get_model(DYNAMIC_UNICYCLE_2D)
    cfg = mpc_cbf.MPCConfig(horizon=8, num_obs=5)
    unknown = pad_obstacles(jnp.asarray(DATA["cl3_unknown"], jnp.float32), 8)
    goal = jnp.asarray(DATA["cl3_goal"], jnp.float32)
    gold = DATA["cl3_traj"]

    detect = jax.jit(
        lambda p, th: fov_mod.detect_unknown_obs_fov(p, th, unknown, spec))
    merge = jax.jit(fov_mod.merge_memory)
    solve = jax.jit(lambda x, obs_k, up, st: mpc_cbf.solve(
        DYNAMIC_UNICYCLE_2D, spec, x, goal, obs_k, up, st, DT, cfg))
    stepm = jax.jit(lambda x, u: model.step(x, u, spec, DT))

    x = jnp.asarray(DATA["cl3_x0"], jnp.float32)
    mem = fov_mod.init_memory(8)
    st = mpc_cbf.init_state(DYNAMIC_UNICYCLE_2D, cfg)
    u_prev = jnp.zeros(2, jnp.float32)
    dev_first, dev_full = 0.0, 0.0
    for k in range(gold.shape[0] - 1):
        det, mask = detect(x[:2], x[2])
        mem = merge(mem, det, mask)
        slots = np.asarray(mem.slots)
        valid = np.asarray(mem.valid)
        obs_rows = slots[valid][:5]
        obs_k = pad_obstacles(
            jnp.asarray(obs_rows.reshape(-1, 7), jnp.float32), 5)
        r = solve(x, obs_k, u_prev, st)
        st, u_prev = r.state, r.u
        x = stepm(x, r.u)
        d = float(np.max(np.abs(np.asarray(x[:2]) - gold[k + 1, :2])))
        dev_full = max(dev_full, d)
        if k < 120:
            dev_first = max(dev_first, d)
    # Measured behavior (2026-08-21): the f32 loop tracks the f64 golden to
    # <2e-3 through the whole first-obstacle detection/avoidance phase
    # (k<120), then diverges to ~0.095 m while SKIMMING the second
    # obstacle — a constraint-active episode where trajectory sensitivity
    # to the f32/f64 control difference is amplified (both runs stay
    # collision-free).  Gate the detection-in-the-loop phase tightly and
    # the amplification tail loosely.
    assert dev_first < 2e-2, f"config3 detection-phase deviation {dev_first}"
    assert dev_full < 2e-1, f"config3 full-run deviation {dev_full}"
