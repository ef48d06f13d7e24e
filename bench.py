"""Benchmark: batched MPC-CBF solves/s/chip (DynamicUnicycle2D, N=8).

This is the BASELINE.json north-star metric.  The reference solves ONE
horizon-10 IPOPT NLP per control period (0.05 s budget, i.e. ~20 solves/s
per CPU, single robot); the target for the TPU build is >=10,000 batched
MPC-CBF solves/s on one chip.  vs_baseline is value / 10,000 (>=1 means the
target is met).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Run on the real TPU (default env).  Make sure no other TPU-attached python
process is alive (single tunnel).
"""

from __future__ import annotations

import json
import time

import numpy as np

TARGET_SOLVES_PER_SEC = 10_000.0


def main() -> None:
    import jax

    from __graft_entry__ import _build_step

    batch = 4096
    step, args = _build_step(batch=batch)
    fn = jax.jit(step)

    # Compile + warm up.  NOTE: completion is forced by a host fetch of one
    # scalar, not ``block_until_ready`` — on the axon tunnel backend
    # block_until_ready has been observed to return before the computation
    # chain actually finishes, which silently corrupts timings.
    out = fn(*args)
    _ = np.asarray(out[0][:1])

    # Steady-state timing: feed the warm-started U back in (closed-loop-like;
    # the data dependency between reps also defeats any result caching).
    xs, goals, obs, u_prevs, Us = args
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        xs, u, Us = fn(xs, goals, obs, u_prevs, Us)
        u_prevs = u
    _ = np.asarray(xs[:1, :1])  # forces the whole rep chain
    elapsed = time.perf_counter() - t0

    solves_per_sec = batch * reps / elapsed
    print(
        json.dumps(
            {
                "metric": "mpc_cbf_solves_per_sec_per_chip_du_N8",
                "value": round(float(solves_per_sec), 1),
                "unit": "solves/s",
                "vs_baseline": round(float(solves_per_sec / TARGET_SOLVES_PER_SEC), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
