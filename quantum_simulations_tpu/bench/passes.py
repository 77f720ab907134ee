"""Per-pass roofline table for the headline circuit (nonstab28).

For every op in the window schedule: measured ms on the chip vs BOTH
resource floors —

* HBM floor: a planar pass reads+writes both f32 planes
  (4 x 2^n bytes) at the measured 819 GB/s v5e peak.
* MXU floor: panel passes are matmul-bound at HIGHEST precision
  (bf16_3x emulation, measured 30 TFLOP/s ceiling on v5e,
  ``ops/pallas_kernels.py:27-35``); a window panel is 3 Gauss real
  matmuls of 128x128 x (2^n/128) = 768*2^n FLOP, a dual panel twice
  that.

so the end-to-end wall clock is auditable pass by pass: which passes
are bandwidth-bound, which are precision-constrained MXU compute, and
where schedule slack remains.

Methodology — prefix differencing.  Timing one op repeated in
isolation is WRONG for the transposing window kernels: a pass that
reads layout A and writes layout B gets a free relabel in the real
chain (the next pass simply consumes B), but repeating it on its own
output forces XLA to insert a physical relayout copy every iteration
(measured: isolated per-pass sums to ~113 ms for a 61 ms circuit).
Instead we compile ops[0..k] for k = 0..P as ONE program each (k = 0
measures the axon-tunnel RTT intercept), run `reps` chained
applications inside `lax.fori_loop`, and report the delta t(k) -
t(k-1) as pass k's in-context cost.  Deltas can shift a little
between adjacent passes when XLA merges a relabel across the op
boundary (a delta slightly under its floor means exactly that); the
TOTAL row is exact.

    python -m quantum_simulations_tpu.bench.passes [--n 28] [--reps 12]
"""
from __future__ import annotations

import argparse
import json
import time

HBM_GBS = 819.0   # measured v5e peak (BENCH_LOCAL microbench)
MXU_TFLOPS = 30.0  # measured v5e bf16_3x (HIGHEST) matmul ceiling


def _op_floors_ms(op, n: int) -> tuple[float, float]:
    """(hbm_floor_ms, mxu_floor_ms) for one window-schedule op."""
    hbm = 4 * 4 * (1 << n) / (HBM_GBS * 1e9) * 1e3 / 2
    kind = type(op).__name__
    panel_flop = 3 * 2 * 128 * (1 << n)  # Gauss 3-mult, 128-wide window
    if kind == "DualPanelOp":
        mxu = 2 * panel_flop / (MXU_TFLOPS * 1e12) * 1e3
    elif kind == "WindowPanelOp":
        mxu = panel_flop / (MXU_TFLOPS * 1e12) * 1e3
    else:  # PhysGateOp / diag epilogues: VPU + bandwidth
        mxu = 0.0
    return hbm, mxu


def run(n: int = 28, reps: int = 12, depth: int = 4, seed: int = 7) -> dict:
    import jax
    import jax.lax as lax
    import jax.numpy as jnp

    from ..circuit import library as lib
    from ..circuit.panelize import compile_window_schedule
    from ..ops import dense
    from ..runtime.simulator import apply_window_op, pair_panel_diag

    cd = lib.non_stabilizer(n, depth=depth, seed=seed)
    ops = pair_panel_diag(compile_window_schedule(cd, diag_terms_only=True))
    interpret = jax.default_backend() != "tpu"

    P = jax.ShapeDtypeStruct((1 << n,), jnp.float32)
    norm2 = jax.jit(
        lambda re, im: jnp.sum(re * re) + jnp.sum(im * im)
    ).lower(P, P).compile()

    def prefix_ms(k: int) -> float:
        """Per-rep ms of ops[0..k) chained inside one program."""
        def body(_, s):
            re, im = s
            for op, dterms in ops[:k]:
                re, im = apply_window_op(re, im, op, jnp.complex64,
                                         interpret, False,
                                         diag_terms=dterms)
            return (re, im)

        fn = jax.jit(
            lambda re, im: lax.fori_loop(0, reps, body, (re, im)),
            donate_argnums=(0, 1)).lower(P, P).compile()
        st = jax.jit(lambda: dense.zero_state_planar(n))()
        st = fn(*st)
        float(jax.device_get(norm2(*st)))  # warm + force
        st = jax.jit(lambda: dense.zero_state_planar(n))()
        t0 = time.perf_counter()
        st = fn(*st)
        float(jax.device_get(norm2(*st)))
        return (time.perf_counter() - t0) / reps * 1e3

    rtt = prefix_ms(0)  # dispatch/fetch intercept, no passes
    rows, prev = [], rtt
    for idx, (op, dterms) in enumerate(ops):
        tot = prefix_ms(idx + 1)
        ms = tot - prev
        prev = tot
        hbm_f, mxu_f = _op_floors_ms(op, n)
        floor = max(hbm_f, mxu_f)
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
            "hbm_floor_ms": round(hbm_f, 2),
            "mxu_floor_ms": round(mxu_f, 2),
            "pct_of_sol": round(100 * floor / ms, 1) if ms > 0 else None,
            "binding": ("MXU@HIGHEST" if mxu_f > hbm_f else "bandwidth"),
        })
        print(json.dumps(rows[-1]), flush=True)

    total = prev - rtt
    comp_floor = sum(max(*_op_floors_ms(op, n)) for op, _ in ops)
    hbm_floor = sum(_op_floors_ms(op, n)[0] for op, _ in ops)
    out = {"circuit": f"nonstab{n} depth={depth} seed={seed}",
           "gates": len(cd["gates"]), "passes": len(rows),
           "method": f"prefix-differencing, {reps} chained reps per "
                     "prefix inside one program; rtt intercept "
                     f"{rtt:.2f} ms subtracted",
           "total_ms": round(total, 2),
           "hbm_floor_total_ms": round(hbm_floor, 2),
           "composite_floor_ms": round(comp_floor, 2),
           "pct_of_composite_sol": round(100 * comp_floor / total, 1),
           "hbm_peak_GBs": HBM_GBS, "mxu_tflops_highest": MXU_TFLOPS,
           "rows": rows}
    print(json.dumps({k: v for k, v in out.items() if k != "rows"}))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=28)
    ap.add_argument("--reps", type=int, default=12)
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
