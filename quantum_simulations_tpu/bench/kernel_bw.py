"""Per-op-class bandwidth benchmark vs the HBM roofline.

For each op class (1q plane update at several qubit positions, 2q
plane, fused 128-panel matmul, bit rotation) measures effective GB/s
(bytes moved = read + write of the full state) and reports utilisation
against a nominal HBM peak.  The matmul-vs-IO economics the reference
measures on disk (``wenbo_engine/bench/matmul_vs_io.py``) show up here
as "how many fused gates does one panel pass amortise".
"""
from __future__ import annotations

import functools
import json

import numpy as np

from . import force, setup_platform, timeit, warm_grant

HBM_PEAK_GBS = {"v5e": 819.0, "v5p": 2765.0}


def run(n: int = 26, dtype="complex64", reps: int = 5) -> dict:
    import jax
    import jax.numpy as jnp

    from ..circuit import gates as G
    from ..ops import dense

    dev = setup_platform()
    warm_grant()
    nbytes = (1 << n) * jnp.dtype(dtype).itemsize
    S = jax.ShapeDtypeStruct((1 << n,), jnp.dtype(dtype))

    mk = jax.jit(lambda: dense.zero_state(n, dtype))
    psi = mk()
    force(psi)

    cases = {}
    H = G.H()
    for q in (0, 8, n // 2, n - 1):
        cases[f"1q_plane_q{q}"] = functools.partial(dense.apply_gate, qubits=(q,), U=H)
    cases["2q_plane_hi"] = functools.partial(
        dense.apply_gate, qubits=(n - 2, 9), U=G.CNOT())
    cases["2q_mixed_lo_hi"] = functools.partial(
        dense.apply_gate, qubits=(2, n - 2), U=G.CNOT())
    W = dense.compose_low_panel(
        [((q,), H) for q in range(7)] + [((0, 1), G.CNOT())], 7)
    cases["panel128_8gates"] = functools.partial(dense.apply_low_panel, W=W)
    cases["rotate7"] = functools.partial(dense.rotate_bits_right, r=7)

    results = {}
    for name, op in cases.items():
        fn = jax.jit(lambda x, op=op: op(x)).lower(S).compile()
        dt = timeit(lambda: force(fn(psi)), reps)
        gbs = 2 * nbytes / dt / 1e9
        results[name] = {"s": round(dt, 5), "GBs": round(gbs, 3)}

    peak = HBM_PEAK_GBS.get("v5e")
    for v in results.values():
        v["pct_roofline_v5e"] = round(100 * v["GBs"] / peak, 1)
    return {"n": n, "dtype": str(dtype), "device": str(dev), "ops": results}


if __name__ == "__main__":
    print(json.dumps(run(), indent=1))
