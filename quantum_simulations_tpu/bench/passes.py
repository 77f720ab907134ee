"""Per-pass roofline table for the headline benchmark circuits.

For every op in the window schedule: measured ms on the chip vs BOTH
resource floors —

* HBM floor: a planar pass reads AND writes both f32 planes
  (16 bytes/amplitude total) at the measured 819 GB/s v5e peak:
  ``16 * 2^n / 819e9`` seconds.  This is a hard physical bound — no
  full-state pass can measure below it.
* MXU floor: panel passes are matmul-bound at HIGHEST precision
  (analytic 32.8 TFLOP/s ceiling: v5e 196.7 bf16 TFLOP/s / 6
  emulation passes; the best kernel sustains 30.5, and a manual
  bf16_3x split raced slower — ``ops/pallas_kernels.py:27-35``).
  A 2^w-wide Gauss panel is 3 real matmuls of
  2^w x 2^w x (2^n/2^w) = ``3*2*2^w*2^n`` FLOP; the width is derived
  from the op's actual W (NOT assumed 128), a dual panel sums both
  constituent panels (its second contraction rides the same HBM
  pass).

so the end-to-end wall clock is auditable pass by pass: which passes
are bandwidth-bound, which are precision-constrained MXU compute,
which carry dispatch/overhead slack, and where schedule slack remains.

Fused-diag epilogues riding a panel add their theta-matmul FLOPs
(2*C*2^n for C terms) to that pass's MXU floor; their sin/cos +
rotation runs on the VPU transcendental units, OUTSIDE this floor
model — such passes carry a ``diag-epilogue`` binding label and term
count instead of being misread as schedule slack.

Methodology — two-point prefix differencing.  Timing one op repeated
in isolation is WRONG for the transposing window kernels: a pass that
reads layout A and writes layout B gets a free relabel in the real
chain (the next pass simply consumes B), but repeating it on its own
output forces XLA to insert a physical relayout copy every iteration
(measured: isolated per-pass sums to ~113 ms for a 61 ms circuit).
Instead, ops[0..k) for k = 0..P compile as ONE program each with a
TRACED `lax.fori_loop` trip count; per-rep cost of prefix k is
(t(2R) - t(R)) / R with a min over `samples` runs of each trip count
(contention/tunnel hiccups only ever ADD time), so the per-program
fixed cost — dispatch, result fetch, tunnel RTT — cancels EXACTLY
rather than being estimated from a k=0 intercept (whose spread
leaked into pass 0's delta in earlier revisions).  Deltas of the
monotone-clamped per-rep curve are each pass's in-context cost.
Round 4 published single-shot deltas, which put one pass at 5x its
floor — physically impossible (3.2 TB/s on 819 GB/s HBM).  Residual
adjacent-pass attribution spill is still possible when XLA shifts
work across an op boundary, so any delta below 97% of its OWN floor
is merged with its neighbor to a fixpoint; a group's floor is the
SUM of its members' max-floors (identical accounting to the
composite floor), so no reported row can overstate pct_of_sol and
rows may read at most ~103% of floor (the estimator tolerance).  The
TOTAL row is exact either way.  Raw per-prefix wall times ship in
the output for independent re-attribution.

    python -m quantum_simulations_tpu.bench.passes [--config nonstab28]
        [--reps 12] [--samples 5] [--update-bench-local]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

HBM_GBS = 819.0   # measured v5e peak (BENCH_LOCAL microbench)
# Analytic MXU ceiling for f32 matmuls at Precision.HIGHEST: the v5e
# MXU peaks at 196.7 bf16 TFLOP/s and HIGHEST emulates each f32
# product with 6 bf16 passes -> 196.7 / 6 = 32.8 TFLOP/s.  The dual
# panel kernel measures 30.5 TFLOP/s (93% of this), which is why the
# old "measured 30" constant put one pass at a nonsensical 101.7% of
# its own floor — a floor must be unachievable-or-equal, so it is
# derived from the hardware peak, not from our best kernel.
MXU_TFLOPS = 196.7 / 6


def _panel_width(W) -> int:
    """Panel dimension 2^w from the op's actual unitary."""
    if isinstance(W, tuple):  # traced (wr, wi) planes
        return int(W[0].shape[-1])
    return int(np.asarray(W).shape[-1])


def _op_floors_ms(op, n: int, dterms=None) -> tuple[float, float]:
    """(hbm_floor_ms, mxu_floor_ms) for one window-schedule op.

    HBM: every full-state planar pass moves >= 16 bytes/amplitude
    (read + write of both f32 planes).  MXU: Gauss 3-mult FLOPs from
    the op's REAL panel width(s) (ADVICE r4: no hardcoded 128).  A
    fused-diag epilogue (``dterms``) adds its theta matmul
    (2 * C * 2^n FLOP for C terms); its sin/cos + rotation runs on
    the VPU's transcendental units, which this floor model does NOT
    cover — such passes are labeled, not slack-shamed.
    """
    hbm = 16 * (1 << n) / (HBM_GBS * 1e9) * 1e3
    kind = type(op).__name__
    if kind == "DualPanelOp":
        fl = sum(3 * 2 * _panel_width(p.W) * (1 << n)
                 for p in (op.first, op.second))
        mxu = fl / (MXU_TFLOPS * 1e12) * 1e3
    elif kind == "WindowPanelOp":
        fl = 3 * 2 * _panel_width(op.W) * (1 << n)
        mxu = fl / (MXU_TFLOPS * 1e12) * 1e3
    else:  # PhysGateOp / swaps / bitperm / diag broadcasts: VPU + HBM
        mxu = 0.0
    if dterms:
        mxu += 2 * len(dterms) * (1 << n) / (MXU_TFLOPS * 1e12) * 1e3
    return hbm, mxu


def _binding(ms: float, hbm_f: float, mxu_f: float,
             floor: float | None = None) -> str:
    """Which resource bounds this pass — with an explicit overhead
    class when the measurement sits far above the floor (ADVICE r4:
    a floor-only label would hide dispatch/layout slack)."""
    if floor is None:
        floor = max(hbm_f, mxu_f)
    if floor > 0 and ms > 1.35 * floor:
        return "overhead/slack"
    return "MXU@HIGHEST" if mxu_f > hbm_f else "bandwidth"


def _op_detail(op) -> str:
    kind = type(op).__name__
    if kind == "DualPanelOp":
        return (f"pos={op.first.pos}+{op.second.pos} "
                f"fused={op.first.n_fused}+{op.second.n_fused}")
    if hasattr(op, "pos"):
        return f"pos={op.pos} fused={getattr(op, 'n_fused', '?')}"
    if hasattr(op, "qubits"):
        return f"q={op.qubits}"
    if hasattr(op, "pairs"):
        return f"pairs={op.pairs}"
    return ""


def _build_circuit(config: str):
    from ..circuit import library as lib

    if config.startswith("nonstab"):
        return lib.non_stabilizer(int(config[7:] or 28), depth=4, seed=7)
    if config == "sycamore26_d8":
        return lib.sycamore_like(26, depth=8, seed=11)
    if config == "qaoa26_p2":
        return lib.qaoa_maxcut(26, p=2)
    if config == "qft26":
        return lib.qft(26)
    raise SystemExit(f"unknown --config {config}")


def run(config: str = "nonstab28", reps: int = 12,
        samples: int = 5) -> dict:
    import jax
    import jax.lax as lax
    import jax.numpy as jnp

    from ..circuit.panelize import compile_window_schedule
    from ..ops import dense
    from ..runtime.simulator import apply_window_op, pair_panel_diag

    cd = _build_circuit(config)
    n = cd["number_of_qubits"]
    ops = pair_panel_diag(compile_window_schedule(cd, diag_terms_only=True))
    interpret = jax.default_backend() != "tpu"

    P = jax.ShapeDtypeStruct((1 << n,), jnp.float32)
    norm2 = jax.jit(
        lambda re, im: jnp.sum(re * re) + jnp.sum(im * im)
    ).lower(P, P).compile()
    zero_state = jax.jit(lambda: dense.zero_state_planar(n))  # one trace

    def prefix_per_rep_ms(k: int) -> tuple[float, list[float], list[float]]:
        """Per-rep ms of ops[0..k) chained in one program.

        The loop trip count is a TRACED scalar, so one compile serves
        two rep counts; per-rep cost = (t(2R) - t(R)) / R with mins
        over `samples` runs of each — the per-program fixed cost
        (dispatch, fetch, axon-tunnel RTT) cancels EXACTLY instead of
        being estimated from a k=0 intercept (whose spread previously
        leaked into pass 0's delta: one qaoa26 group read 106.7% of
        its floor from exactly that).
        """
        def body(_, s):
            re, im = s
            for op, dterms in ops[:k]:
                re, im = apply_window_op(re, im, op, jnp.complex64,
                                         interpret, False,
                                         diag_terms=dterms)
            return (re, im)

        fn = jax.jit(
            lambda re, im, r: lax.fori_loop(0, r, body, (re, im)),
            donate_argnums=(0, 1)).lower(
                P, P, jax.ShapeDtypeStruct((), jnp.int32)).compile()

        def timed(r) -> list[float]:
            st = zero_state()
            st = fn(*st, jnp.int32(r))
            float(jax.device_get(norm2(*st)))  # warm + force
            out = []
            for _ in range(samples):
                st = zero_state()
                t0 = time.perf_counter()
                st = fn(*st, jnp.int32(r))
                float(jax.device_get(norm2(*st)))
                out.append((time.perf_counter() - t0) * 1e3)
            return out

        t1, t2 = timed(reps), timed(2 * reps)
        return (min(t2) - min(t1)) / reps, t1, t2

    per_rep, curve = [], []
    for k in range(len(ops) + 1):
        v, t1, t2 = prefix_per_rep_ms(k)
        per_rep.append(v)
        curve.append({"k": k,
                      f"t{reps}_ms": [round(x, 2) for x in t1],
                      f"t{2 * reps}_ms": [round(x, 2) for x in t2]})
    rtt = per_rep[0]  # empty-program per-rep cost (~0 by construction)
    # Monotone constraint: a longer prefix cannot be cheaper than a
    # shorter one — clamp residual noise so deltas are >= 0.
    cum = [per_rep[0]]
    for v in per_rep[1:]:
        cum.append(max(v, cum[-1]))

    raw = []
    for idx, (op, dterms) in enumerate(ops):
        ms = cum[idx + 1] - cum[idx]
        hbm_f, mxu_f = _op_floors_ms(op, n, dterms)
        raw.append({"ops": [idx], "kinds": [type(op).__name__],
                    "details": [_op_detail(op)], "ms": ms,
                    "hbm": hbm_f, "mxu": mxu_f,
                    "diag_terms": len(dterms) if dterms else 0,
                    "floor": max(hbm_f, mxu_f)})

    # Attribution-spill repair: a pass cannot beat its own floor (HBM
    # is a hard physical bound; the MXU ceiling is the hardware peak /
    # emulation passes) — a delta below it means prefix differencing
    # shifted work into a neighbor.  Merge such rows with their
    # predecessor (successor for a leading row) to a FIXPOINT: the
    # combined measure is compared against the SUM of the members'
    # individual max-floors (the same accounting as the composite
    # floor), so no reported row can overstate pct_of_sol.
    def _merge(a: dict, b: dict) -> dict:
        return {"ops": a["ops"] + b["ops"], "kinds": a["kinds"] + b["kinds"],
                "details": a["details"] + b["details"],
                "ms": a["ms"] + b["ms"], "hbm": a["hbm"] + b["hbm"],
                "mxu": a["mxu"] + b["mxu"],
                "diag_terms": a["diag_terms"] + b["diag_terms"],
                "floor": a["floor"] + b["floor"], "merged": True}

    groups = [dict(r) for r in raw]
    changed = True
    while changed and len(groups) > 1:
        changed = False
        for i, g in enumerate(groups):
            if g["ms"] < 0.97 * g["floor"]:
                j = i - 1 if i > 0 else i + 1
                lo, hi = min(i, j), max(i, j)
                groups[lo:hi + 1] = [_merge(groups[lo], groups[hi])]
                changed = True
                break

    rows = []
    for g in groups:
        row = {
            "passes": g["ops"],
            "kind": "+".join(g["kinds"]),
            "detail": "; ".join(d for d in g["details"] if d),
            "measured_ms": round(g["ms"], 4),
            "hbm_floor_ms": round(g["hbm"], 4),
            "mxu_floor_ms": round(g["mxu"], 4),
            "floor_ms": round(g["floor"], 4),
            "pct_of_sol": (round(100 * g["floor"] / g["ms"], 1)
                           if g["ms"] > 0 else None),
            "binding": _binding(g["ms"], g["hbm"], g["mxu"], g["floor"]),
        }
        if g["diag_terms"]:
            # sin/cos + rotation of the fused-diag epilogue runs on
            # the VPU transcendental units — outside this floor model;
            # the pass is labeled rather than slack-shamed.
            row["diag_epilogue_terms"] = g["diag_terms"]
            if row["binding"] == "overhead/slack":
                row["binding"] = "diag-epilogue(VPU trig; floor omits)"
        
        if g.get("merged"):
            row["note"] = ("attribution group: a constituent delta fell "
                           "below its own floor (boundary spill); "
                           "combined measure vs summed member floors")
        rows.append(row)
        print(json.dumps(row), flush=True)

    total = cum[-1] - rtt
    comp_floor = sum(max(*_op_floors_ms(op, n, dt)) for op, dt in ops)
    hbm_floor = sum(_op_floors_ms(op, n, dt)[0] for op, dt in ops)
    out = {"circuit": config, "n": n,
           "gates": len(cd["gates"]), "passes": len(ops),
           "method": "two-point prefix-differencing: per-rep cost = "
                     f"(t({2 * reps}) - t({reps})) / {reps} per prefix "
                     f"(one compile, traced trip count), min of {samples} "
                     "runs each — the per-program fixed cost cancels "
                     "exactly (no k=0 intercept estimate); "
                     f"empty-program residual {rtt:.2f} ms; deltas below "
                     "97% of their own floor merged into attribution "
                     "groups to a fixpoint (rows may read up to ~103% "
                     "of floor: the estimator tolerance)",
           "total_ms": round(total, 2),
           "hbm_floor_total_ms": round(hbm_floor, 2),
           "composite_floor_ms": round(comp_floor, 2),
           "pct_of_composite_sol": (round(100 * comp_floor / total, 1)
                                    if total > 0 else None),
           "hbm_peak_GBs": HBM_GBS, "mxu_tflops_highest": MXU_TFLOPS,
           "per_rep_prefix_ms": [round(v, 3) for v in per_rep],
           "raw_prefix_wall_ms": curve,
           "rows": rows}
    print(json.dumps({k: v for k, v in out.items() if k != "rows"}))
    return out


def main():
    import os

    import jax

    # Persistent compile cache: re-audits reuse every prefix program.
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="nonstab28")
    ap.add_argument("--reps", type=int, default=12)
    ap.add_argument("--samples", type=int, default=5)
    ap.add_argument("--update-bench-local", action="store_true")
    a = ap.parse_args()
    res = run(config=a.config, reps=a.reps, samples=a.samples)
    if a.update_bench_local:
        import json as J
        import os

        p = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), "BENCH_LOCAL.json")
        d = J.load(open(p))
        key = ("per_pass_roofline" if a.config == "nonstab28"
               else f"per_pass_roofline_{a.config}")
        d[key] = res
        with open(p, "w") as f:
            J.dump(d, f, indent=1)
        print(f"BENCH_LOCAL.json updated ({key})")


if __name__ == "__main__":
    main()
