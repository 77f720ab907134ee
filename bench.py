"""Headline benchmark — runs on real TPU hardware (ambient axon platform).

Workload: the reference's scaling benchmark family — a non-stabilizer
H+T+CNOT layered circuit at n=28 (268M amplitudes, complex64), the
largest size the reference runs both in-RAM (412 s, complex128) and
out-of-core (139 s, complex64) on its benchmark machine
(``wenbo_engine/docs/v3_comparison.md:45-62``).

Prints ONE JSON line:
  metric  amplitude-updates per second at n=28
          (gates x 2^28 / wall-second, steady-state, compile excluded)
  vs_baseline  reference out-of-core wall time (139 s) divided by our
          wall time for a circuit of the same family and comparable
          gate count — i.e. how many times faster this engine finishes
          the reference's n=28 benchmark tier.
"""
from __future__ import annotations

import json
import sys
import time


def main() -> None:
    import jax

    from quantum_simulations_tpu.circuit import library as lib
    from quantum_simulations_tpu.runtime import simulator

    n = 28
    cd = lib.non_stabilizer(n, depth=4, seed=7)
    n_gates = len(cd["gates"])

    fn = simulator.build_circuit_fn(cd, dtype="complex64", donate=False)

    from quantum_simulations_tpu.ops import dense

    psi = dense.zero_state(n, "complex64")
    # Warm-up: compile + one run.
    out = fn(psi)
    out.block_until_ready()
    del out

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(psi)
        out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    amp_updates_per_s = n_gates * (1 << n) / dt
    ref_wall_s = 139.0  # reference out-of-core n=28 (v3_comparison.md:60)
    result = {
        "metric": f"amplitude-updates/sec, n={n} non-stabilizer ({n_gates} gates)",
        "value": round(amp_updates_per_s, 1),
        "unit": "amp-updates/s",
        "vs_baseline": round(ref_wall_s / dt, 1),
        "wall_s": round(dt, 4),
        "n_gates": n_gates,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
