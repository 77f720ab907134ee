"""Per-pass roofline table for the headline circuit (nonstab28).

For every op in the window schedule: measured ms on the chip vs the
HBM-bandwidth floor (planar pass = read+write both f32 planes =
4 x 2^n bytes at the measured 819 GB/s v5e peak), so the end-to-end
wall clock is auditable pass by pass — which passes are
bandwidth-bound, which pay MXU time for full-precision panel algebra
(``ops/pallas_kernels.py:27-35``), and where schedule slack remains.

    python -m quantum_simulations_tpu.bench.passes [--n 28] [--reps 8]
"""
from __future__ import annotations

import argparse
import json
import time

HBM_GBS = 819.0  # measured v5e peak (BENCH_LOCAL microbench)


def run(n: int = 28, reps: int = 8, depth: int = 4, seed: int = 7) -> dict:
    import jax
    import jax.numpy as jnp

    from ..circuit import library as lib
    from ..circuit.panelize import compile_window_schedule
    from ..ops import dense
    from ..runtime.simulator import apply_window_op, pair_panel_diag

    cd = lib.non_stabilizer(n, depth=depth, seed=seed)
    ops = pair_panel_diag(compile_window_schedule(cd, diag_terms_only=True))
    interpret = jax.default_backend() != "tpu"

    P = jax.ShapeDtypeStruct((1 << n,), jnp.float32)
    state = jax.jit(lambda: dense.zero_state_planar(n))()
    norm2 = jax.jit(
        lambda re, im: jnp.sum(re * re) + jnp.sum(im * im)
    ).lower(P, P).compile()
    float(jax.device_get(norm2(*state)))  # force + grant

    plane_bytes = 4 * (1 << n)  # bytes moved per pass: r/w both planes
    floor_ms = 4 * plane_bytes / (HBM_GBS * 1e9) * 1e3 / 2

    rows = []
    for idx, (op, dterms) in enumerate(ops):
        def one(re, im, op=op, dterms=dterms):
            return apply_window_op(re, im, op, jnp.complex64, interpret,
                                   False, diag_terms=dterms)

        fn = jax.jit(one, donate_argnums=(0, 1)).lower(P, P).compile()
        # warm
        re, im = fn(*state)
        float(jax.device_get(norm2(re, im)))
        t0 = time.perf_counter()
        for _ in range(reps):
            re, im = fn(re, im)
        float(jax.device_get(norm2(re, im)))
        ms = (time.perf_counter() - t0) / reps * 1e3
        kind = type(op).__name__
        detail = ""
        if hasattr(op, "pos"):
            detail = f"pos={op.pos} fused={getattr(op, 'n_fused', '?')}"
        elif kind == "DualPanelOp":
            detail = (f"pos={op.first.pos}+{op.second.pos} "
                      f"fused={op.first.n_fused}+{op.second.n_fused}")
        elif hasattr(op, "qubits"):
            detail = f"q={op.qubits}"
        rows.append({
            "pass": idx, "kind": kind, "detail": detail,
            "measured_ms": round(ms, 2),
            "hbm_floor_ms": round(floor_ms, 2),
            "pct_of_sol": round(100 * floor_ms / ms, 1) if ms else None,
            "binding": ("bandwidth" if ms < 1.35 * floor_ms
                        else "compute/overhead"),
        })
        print(json.dumps(rows[-1]), flush=True)
        state = (re, im)

    total = sum(r["measured_ms"] for r in rows)
    out = {"circuit": f"nonstab{n} depth={depth} seed={seed}",
           "gates": len(cd["gates"]), "passes": len(rows),
           "sum_pass_ms": round(total, 2),
           "hbm_floor_total_ms": round(floor_ms * len(rows), 2),
           "hbm_peak_GBs": HBM_GBS, "rows": rows}
    print(json.dumps({k: v for k, v in out.items() if k != "rows"}))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=28)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--update-bench-local", action="store_true")
    a = ap.parse_args()
    res = run(n=a.n, reps=a.reps)
    if a.update_bench_local:
        import json as J
        import os

        p = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), "BENCH_LOCAL.json")
        d = J.load(open(p))
        d["per_pass_roofline"] = res
        with open(p, "w") as f:
            J.dump(d, f, indent=1)
        print("BENCH_LOCAL.json updated")


if __name__ == "__main__":
    main()
