"""Per-op-class bandwidth benchmark vs the HBM roofline.

For each op class (1q plane update at several qubit positions, 2q
plane, fused 128-panel matmul, bit rotation, planar Pallas panel)
measures effective GB/s with the op repeated ``iters`` times INSIDE
one program (the tunnel's ~44 ms dispatch+fetch latency would swamp a
single pass; ``lax.fori_loop`` can be unsupported, so the loop is
unrolled).  The matmul-vs-IO economics the reference measures on disk
(``wenbo_engine/bench/matmul_vs_io.py``) show up here as "how many
fused gates one panel pass amortises".
"""
from __future__ import annotations

import json

from . import setup_platform, timeit, warm_grant

HBM_PEAK_GBS = {"v5e": 819.0, "v5p": 2765.0}
FETCH_LATENCY_S = 0.044


def run(n: int = 26, dtype="complex64", reps: int = 3, iters: int = 16) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..circuit import gates as G
    from ..ops import dense
    from ..ops.pallas_kernels import panel_apply_planar

    dev = setup_platform()
    warm_grant()
    nbytes = (1 << n) * jnp.dtype(dtype).itemsize

    H = G.H()
    W = dense.compose_low_panel(
        [((q,), H) for q in range(7)] + [((0, 1), G.CNOT())], 7)

    cases = {
        "1q_plane_q8": lambda v: dense.apply_gate(v, (8,), H),
        f"1q_plane_q{n-1}": lambda v: dense.apply_gate(v, (n - 1,), H),
        "2q_plane_hi": lambda v: dense.apply_gate(v, (n - 2, 9), G.CNOT()),
        "2q_mixed_lo_hi": lambda v: dense.apply_gate(v, (2, n - 2), G.CNOT()),
        "panel128_8gates": lambda v: dense.apply_low_panel(v, W),
        "rotate7": lambda v: dense.rotate_bits_right(v, 7),
        "diag_cz_crossing": lambda v: dense.apply_gate(
            v, (3, n - 3), G.CZ()),
    }

    def bench_complex(op):
        def prog():
            psi = jnp.zeros(1 << n, dtype=jnp.dtype(dtype)).at[0].set(1.0)
            for _ in range(iters):
                # The barrier stops XLA fusing/folding the repeated op
                # across iterations (16 fused H's measured >roofline).
                psi = jax.lax.optimization_barrier(op(psi))
            return jnp.sum(jnp.real(psi) ** 2 + jnp.imag(psi) ** 2)
        c = jax.jit(prog).lower().compile()
        return timeit(lambda: float(jax.device_get(c())), reps)

    results = {}
    for name, op in cases.items():
        dt = bench_complex(op)
        per = max((dt - FETCH_LATENCY_S) / iters, 1e-9)
        results[name] = {
            "s_per_pass": round(per, 5),
            "GBs": round(2 * nbytes / per / 1e9, 1),
        }

    # Planar Pallas lane panel (two f32 planes).
    def prog_pl():
        re = jnp.full(1 << n, 0.5, jnp.float32)
        im = jnp.full(1 << n, 0.5, jnp.float32)
        for _ in range(iters):
            re, im = jax.lax.optimization_barrier(
                panel_apply_planar(re, im, W))
        return jnp.sum(re * 1e-9) + jnp.sum(im * 1e-9)
    try:
        c = jax.jit(prog_pl).lower().compile()
        dt = timeit(lambda: float(jax.device_get(c())), reps)
        per = max((dt - FETCH_LATENCY_S) / iters, 1e-9)
        results["pallas_lane_panel"] = {
            "s_per_pass": round(per, 5),
            "GBs": round(2 * nbytes / per / 1e9, 1),
        }
    except Exception as e:
        results["pallas_lane_panel"] = {"error": str(e)[:120]}

    # Fused-diag kernel (capacity tier): a merged 6-gate mixed-qubit
    # diagonal run in one aliased pass, phases from in-kernel iota.
    from ..circuit.panelize import diag_phase_terms
    from ..ops.pallas_kernels import fused_diag_planar

    rng = np.random.default_rng(7)
    terms: dict = {}
    for qs in [(3, n - 3), (n - 1,), (5,), (8, 2), (n - 2, 9), (0,)]:
        dv = np.exp(1j * rng.uniform(-np.pi, np.pi, size=1 << len(qs)))
        for k, c in diag_phase_terms(qs, dv).items():
            k = tuple(sorted(k))
            terms[k] = terms.get(k, 0.0) + c
    terms_t = tuple(terms.items())

    def prog_fd():
        re = jnp.full(1 << n, 0.5, jnp.float32)
        im = jnp.full(1 << n, 0.5, jnp.float32)
        for _ in range(iters):
            re, im = jax.lax.optimization_barrier(
                fused_diag_planar(re, im, terms_t, inplace=True))
        return jnp.sum(re * 1e-9) + jnp.sum(im * 1e-9)
    try:
        c = jax.jit(prog_fd).lower().compile()
        dt = timeit(lambda: float(jax.device_get(c())), reps)
        per = max((dt - FETCH_LATENCY_S) / iters, 1e-9)
        results["pallas_fused_diag_6gates"] = {
            "s_per_pass": round(per, 5),
            "GBs": round(2 * nbytes / per / 1e9, 1),
        }
    except Exception as e:
        results["pallas_fused_diag_6gates"] = {"error": str(e)[:120]}

    peak = HBM_PEAK_GBS.get("v5e")
    for v in results.values():
        if "GBs" in v:
            v["pct_roofline_v5e"] = round(100 * v["GBs"] / peak, 1)
    return {"n": n, "dtype": str(dtype), "iters": iters,
            "device": str(dev), "ops": results}


if __name__ == "__main__":
    print(json.dumps(run(), indent=1))
