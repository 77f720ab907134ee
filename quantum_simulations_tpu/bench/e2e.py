"""End-to-end circuit throughput across families and modes.

Analogue of ``wenbo_engine/bench/end_to_end.py`` — wall time and
amplitude-updates/s for GHZ/QFT/random/QAOA/Sycamore at a range of n,
in both execution modes (per-gate fused vs rotating-panel).
"""
from __future__ import annotations

import json
import time

from . import force, setup_platform, timeit, warm_grant


def run(sizes=(20, 24), families=("ghz", "qft", "nonstab", "sycamore"),
        modes=("window", "panel", "fused"), dtype="complex64", reps: int = 3) -> dict:
    import jax
    import jax.numpy as jnp

    from ..circuit import library as lib
    from ..ops import dense
    from ..runtime import simulator

    dev = setup_platform()
    warm_grant()
    out: dict = {"device": str(dev), "dtype": dtype, "results": []}
    for n in sizes:
        S = jax.ShapeDtypeStruct((1 << n,), jnp.dtype(dtype))
        mk = jax.jit(lambda n=n: dense.zero_state(n, dtype))
        psi = mk()
        force(psi)
        for fam in families:
            cd = lib.FAMILIES[fam](n)
            for mode in modes:
                t0 = time.time()
                if mode == "panel":
                    fn = simulator.build_panel_circuit_fn(
                        cd, dtype=dtype, donate=False)
                elif mode == "window":
                    fn = simulator.build_window_circuit_fn(
                        cd, dtype=dtype, donate=False)
                else:
                    fn = simulator.build_circuit_fn(
                        cd, dtype=dtype, donate=False)
                compiled = fn.lower(S).compile()
                compile_s = time.time() - t0
                dt = timeit(lambda: force(compiled(psi)), reps)
                out["results"].append({
                    "family": fam, "n": n, "mode": mode,
                    "gates": len(cd["gates"]),
                    "compile_s": round(compile_s, 2),
                    "wall_s": round(dt, 4),
                    "amp_updates_per_s": round(
                        len(cd["gates"]) * (1 << n) / dt, 1),
                })
    return out


if __name__ == "__main__":
    print(json.dumps(run(), indent=1))
