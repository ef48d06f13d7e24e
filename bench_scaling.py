"""Scaling-efficiency harness: MPC-CBF solves/s vs device-mesh size.

Measures the BASELINE.md multi-host target (>=85% scaling efficiency at
2 hosts) on whatever mesh is available: the real TPU slice when attached,
else the virtual CPU mesh (run with
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8``).

Weak scaling: a fixed per-device batch of MPC-CBF solves (DynamicUnicycle2D,
N=8 — the BASELINE north-star op) is sharded over a 1-D 'scenario' mesh via
shard_map; scaling efficiency at n devices = throughput(n) / (n *
throughput(1)).  The host-driver overhead is measured separately as the
per-dispatch wall time of an (almost) zero-work jitted program on the same
sharded layout — the fixed cost the mesh must amortize.

Prints ONE JSON line per mesh size:
  {"metric": "mpc_cbf_scaling", "n_devices": n, "value": solves_per_sec,
   "per_device": ..., "efficiency": ..., "dispatch_overhead_ms": ...}

VALIDITY.  On a virtual CPU mesh every "device" shares the host's physical
cores, so weak-scaling "efficiency" measures compute oversubscription, NOT
communication/driver overhead — at 8 virtual devices on a 2-core host it is
~cores/n_devices by construction.  Records produced on such a mesh carry
``compute_bound_virtual_mesh: true`` and ``valid_for_baseline_target:
false`` so they cannot masquerade as the >=85%-at-2-hosts BASELINE metric,
and additionally report ``aggregate_throughput_retention`` = tps(n)/tps(1),
which IS meaningful there: it shows the sharding machinery adds no overhead
beyond the fixed compute (1.0 = perfectly flat).  The real metric comes from
running this same script unmodified on a multi-chip TPU slice (each mesh
device = one real chip), where efficiency(2)/1.0 maps onto the 2-host
target.
"""

from __future__ import annotations

import json
import time

import numpy as np

PER_DEVICE_BATCH = 1024
REPS = 5


def _mesh_sizes(n: int):
    sizes = [1]
    while sizes[-1] * 2 <= n:
        sizes.append(sizes[-1] * 2)
    return sizes


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from safe_control_tpu.core.spec import DYNAMIC_UNICYCLE_2D, make_spec
    from safe_control_tpu.core.types import pad_obstacles
    from safe_control_tpu.parallel.mesh import SCENARIO_AXIS, scenario_mesh
    from safe_control_tpu.solvers import mpc_cbf

    spec = make_spec(DYNAMIC_UNICYCLE_2D, a_max=1.0, w_max=0.5)
    cfg = mpc_cbf.MPCConfig(horizon=8, num_obs=5)
    dt = 0.05
    goal = jnp.array([3.0, 0.5, 0.0, 0.0], jnp.float32)
    obs = pad_obstacles(
        jnp.asarray([[1.5, 0.2, 0.3, 0, 0, 0, 0]], jnp.float32), 5
    )

    n_avail = len(jax.devices())
    results = []
    base_tps = None
    for n_dev in _mesh_sizes(n_avail):
        mesh = scenario_mesh(n_dev)
        B = PER_DEVICE_BATCH * n_dev
        rng = np.random.default_rng(0)
        xs = jnp.asarray(
            np.concatenate(
                [rng.uniform(0, 1, (B, 2)), rng.uniform(-0.5, 0.5, (B, 1)),
                 rng.uniform(0.1, 0.6, (B, 1))], axis=1,
            ), jnp.float32,
        )
        u_prevs = jnp.zeros((B, 2), jnp.float32)
        st0 = mpc_cbf.init_state(DYNAMIC_UNICYCLE_2D, cfg)
        Us = jnp.tile(st0.U[None], (B, 1, 1))
        lams = jnp.tile(st0.lam[None], (B, 1))

        def local(xs, u_prevs, Us, lams):
            def one(x, up, U, lam):
                res = mpc_cbf.solve(
                    DYNAMIC_UNICYCLE_2D, spec, x, goal, obs, up,
                    mpc_cbf.MPCState(U=U, lam=lam), dt, cfg,
                )
                return res.u, res.state.U, res.state.lam

            return jax.vmap(one)(xs, u_prevs, Us, lams)

        sharded = jax.jit(
            shard_map(
                local, mesh=mesh,
                in_specs=(P(SCENARIO_AXIS),) * 4,
                out_specs=(P(SCENARIO_AXIS),) * 3,
                check_rep=False,
            )
        )
        data = NamedSharding(mesh, P(SCENARIO_AXIS))
        xs, u_prevs, Us, lams = (
            jax.device_put(a, data) for a in (xs, u_prevs, Us, lams)
        )

        # warm-up / compile; completion forced by host fetch (axon caveat)
        u, Us_w, lams_w = sharded(xs, u_prevs, Us, lams)
        _ = np.asarray(u[:1])

        t0 = time.perf_counter()
        for _ in range(REPS):
            u, Us_w, lams_w = sharded(xs, u_prevs, Us_w, lams_w)
            u_prevs = u
        _ = np.asarray(u[:1, :1])
        elapsed = time.perf_counter() - t0
        tps = B * REPS / elapsed

        # host-driver overhead: dispatch of a near-zero-work program on the
        # same sharded layout
        tiny = jax.jit(
            shard_map(
                lambda x: x + 1.0, mesh=mesh, in_specs=(P(SCENARIO_AXIS),),
                out_specs=P(SCENARIO_AXIS), check_rep=False,
            )
        )
        z = tiny(xs)
        _ = np.asarray(z[:1])
        t0 = time.perf_counter()
        for _ in range(20):
            z = tiny(z)
        _ = np.asarray(z[:1, :1])
        overhead_ms = (time.perf_counter() - t0) / 20 * 1e3

        import os

        platform = jax.devices()[0].platform
        host_cores = os.cpu_count() or 1
        virtual = platform == "cpu"
        if base_tps is None:
            base_tps = tps
        eff = tps / (n_dev * base_tps)
        rec = {
            "metric": "mpc_cbf_scaling",
            "n_devices": n_dev,
            "value": round(float(tps), 1),
            "unit": "solves/s",
            "per_device": round(float(tps / n_dev), 1),
            "efficiency": round(float(eff), 4),
            # tps(n)/tps(1): the only meaningful number on a compute-bound
            # virtual mesh — 1.0 means the sharding machinery adds zero
            # overhead on top of the fixed host compute.
            "aggregate_throughput_retention": round(float(tps / base_tps), 4),
            "dispatch_overhead_ms": round(float(overhead_ms), 3),
            "platform": platform,
            "host_cores": host_cores,
            "compute_bound_virtual_mesh": virtual,
            # On a virtual mesh, 'efficiency' measures core oversubscription
            # (~cores/n_devices by construction), NOT the BASELINE >=85%
            # multi-host target; only a real multi-chip run is valid for it.
            "valid_for_baseline_target": not virtual,
        }
        results.append(rec)
        print(json.dumps(rec))

    # Summary line for the 2-device (2-host proxy) target.
    if len(results) > 1:
        virtual = results[1]["compute_bound_virtual_mesh"]
        print(json.dumps({
            "metric": ("scaling_throughput_retention_at_2_virtual"
                       if virtual else "scaling_efficiency_at_2"),
            "value": (results[1]["aggregate_throughput_retention"]
                      if virtual else results[1]["efficiency"]),
            "unit": "ratio",
            "valid_for_baseline_target": not virtual,
            "vs_baseline": (None if virtual
                            else round(results[1]["efficiency"] / 0.85, 3)),
        }))


if __name__ == "__main__":
    main()
