"""Per-op profiling of a REAL window schedule on the device.

``kernel_bw`` measures synthetic op classes; this module times the
actual ops of a compiled circuit schedule (panels, fused-diag
broadcasts, straddling SWAPs/CNOTs, planar conversions) so the e2e
number can be attributed pass by pass — the reference does the same
attribution with its stage timers (``hisvsim_repo/execute.hpp`` timing
blocks).  It also races the policy alternatives for straddlers
(XLA swapaxes / flip-path vs the Pallas pair kernel) to pick dispatch
rules from measurement, not guesswork.

Methodology per NOTES_ROUND1: ops repeated ``iters`` times inside one
program with optimization barriers (the axon tunnel's ~44 ms
dispatch+fetch swamps single passes), median of ``reps`` fetches.
"""
from __future__ import annotations

import json

from . import setup_platform, timeit, warm_grant

FETCH_LATENCY_S = 0.044


def _class_key(op) -> str:
    from ..circuit.panelize import (
        BitPermGridOp, BitPermOp, DiagOp, MultiSwapOp, PhysGateOp,
        TransposeCrossOp, WindowPanelOp,
    )
    from ..circuit import gates as G

    from ..circuit.panelize import DualPanelOp

    if isinstance(op, DualPanelOp):
        return f"dualpanel@{op.first.pos}+{op.second.pos}"
    if isinstance(op, WindowPanelOp):
        return f"panel@{op.pos}"
    if isinstance(op, MultiSwapOp):
        return f"multiswap{len(op.pairs)}"
    if isinstance(op, BitPermGridOp):
        return f"bitperm_grid{len(op.pairs)}"
    if isinstance(op, TransposeCrossOp):
        return "transpose_cross"
    if isinstance(op, BitPermOp):
        return f"bitperm_mid{len(op.mid_pairs)}"
    if isinstance(op, DiagOp):
        return f"diag{len(op.qubits)}"
    assert isinstance(op, PhysGateOp)
    if G.is_diagonal(op.U):
        return f"diag{len(op.qubits)}"
    if len(op.qubits) == 2:
        import numpy as np

        lo = min(op.qubits)
        kind = op.name if op.name in ("SWAP", "CNOT") else "2q"
        return f"{kind}@lo{lo}"
    return f"generic{len(op.qubits)}"


def profile_schedule(circuit_dict: dict, *, iters: int = 8,
                     reps: int = 3) -> dict:
    """Time every op class of the window schedule of ``circuit_dict``."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..circuit import gates as G
    from ..circuit.panelize import (
        PhysGateOp, WindowPanelOp, compile_window_schedule,
    )
    from ..ops import dense
    from ..ops import pallas_kernels as pk

    from ..runtime.simulator import apply_window_op

    cd = circuit_dict
    n = cd["number_of_qubits"]
    import os as _os
    terms_only = (n >= 10 and
                  _os.environ.get("QST_DIAG_TERMS_ONLY", "1") == "1")
    ops = compile_window_schedule(cd, diag_terms_only=terms_only)
    interpret = jax.default_backend() != "tpu"

    def apply_op(op, re, im):
        # The PRODUCTION dispatcher — profiles attribute exactly what
        # the window executor will run.
        return apply_window_op(re, im, op, jnp.complex64, interpret)

    # One representative per class + counts.
    classes: dict[str, dict] = {}
    for op in ops:
        k = _class_key(op)
        e = classes.setdefault(k, {"count": 0, "rep": op})
        e["count"] += 1

    nbytes_planar = 2 * (1 << n) * 4  # two f32 planes

    def bench_at(op, its) -> float:
        def prog():
            re = jnp.full(1 << n, 0.5, jnp.float32)
            im = jnp.full(1 << n, 0.25, jnp.float32)
            for _ in range(its):
                re, im = jax.lax.optimization_barrier(apply_op(op, re, im))
            return jnp.sum(re * 1e-9) + jnp.sum(im * 1e-9)

        c = jax.jit(prog).lower().compile()
        dt = timeit(lambda: float(jax.device_get(c())), reps)
        return max((dt - FETCH_LATENCY_S) / its, 1e-9)

    def bench(op) -> float:
        # Sub-ms ops at n<=26 drown in the ~44 ms tunnel RTT at 8
        # iters (dt - latency clips to 0) — rescale the in-program
        # loop until the measured portion is >= ~4x the latency.
        its, per = iters, bench_at(op, iters)
        while per * its < 4 * FETCH_LATENCY_S and its < 256:
            its = min(its * 4, 256)
            per = bench_at(op, its)
        return per

    out = {}
    est_total = 0.0
    for k, e in sorted(classes.items()):
        try:
            per = bench(e["rep"])
        except Exception as exc:  # pragma: no cover - device-dependent
            out[k] = {"count": e["count"], "error": str(exc)[:160]}
            continue
        out[k] = {
            "count": e["count"],
            "s_per_pass": round(per, 5),
            "GBs": round(2 * nbytes_planar / per / 1e9, 1),
            "est_total_s": round(per * e["count"], 4),
        }
        est_total += per * e["count"]
    return {
        "n": n,
        "ops": len(ops),
        "classes": out,
        "est_total_s": round(est_total, 4),
    }


def straddler_policies(n: int = 26, *, iters: int = 8, reps: int = 3) -> dict:
    """Race straddler implementations: XLA paths vs the pair kernel."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..circuit import gates as G
    from ..ops import dense
    from ..ops import pallas_kernels as pk

    interpret = jax.default_backend() != "tpu"
    nbytes_planar = 2 * (1 << n) * 4

    def planar_case(fn, its):
        def prog():
            re = jnp.full(1 << n, 0.5, jnp.float32)
            im = jnp.full(1 << n, 0.25, jnp.float32)
            for _ in range(its):
                re, im = jax.lax.optimization_barrier(fn(re, im))
            return jnp.sum(re * 1e-9) + jnp.sum(im * 1e-9)
        return prog

    hi, lo_col, lo_row = n - 2, 8, max(13, n - 9)
    SW, CX = G.SWAP(), G.CNOT()
    cases = {
        # SWAP: today's swapaxes transpose vs the pair kernel
        "swap_xla_transpose": lambda re, im: dense.apply_gate_planar(
            re, im, (hi, lo_col), SW),
        "swap_pair_col": lambda re, im: pk.pair_update_planar(
            re, im, hi, lo_col, SW, interpret=interpret),
        "swap_pair_row": lambda re, im: pk.pair_update_planar(
            re, im, hi, lo_row, SW, interpret=interpret),
        # CNOT: flip path vs pair kernel
        "cnot_xla_flip": lambda re, im: dense.apply_gate_planar(
            re, im, (hi, lo_col), CX),
        "cnot_pair_col": lambda re, im: pk.pair_update_planar(
            re, im, hi, lo_col, CX, interpret=interpret),
        "cnot_pair_row": lambda re, im: pk.pair_update_planar(
            re, im, hi, lo_row, CX, interpret=interpret),
        # dense 2q for completeness
        "dense2q_pair_col": lambda re, im: pk.pair_update_planar(
            re, im, hi, lo_col,
            np.linalg.qr(np.random.default_rng(7).normal(size=(4, 4))
                         + 1j * np.random.default_rng(8).normal(size=(4, 4)))[0],
            interpret=interpret),
    }
    def mixed_old(re, im, qs, U):
        c = dense.apply_gate(pk.from_planar(re, im), qs, U)
        return pk.to_planar(c)

    cases.update({
        # (lane, high) pairs: old complex mixed path vs the Pallas kernel
        "swapmixed_xla": lambda re, im: mixed_old(re, im, (hi, 3), SW),
        "swapmixed_kernel": lambda re, im: pk.mixed_pair_planar(
            re, im, hi, 3, SW, interpret=interpret),
        "cnotmixed_xla": lambda re, im: mixed_old(re, im, (3, hi), CX),
        "cnotmixed_kernel": lambda re, im: pk.mixed_pair_planar(
            re, im, 3, hi, CX, interpret=interpret),
    })

    # two disjoint SWAPs — (n-1, 8) and (n-2, 9) — in ONE transpose pass
    def multi_swap(re, im):
        shape = (2, 2, 1 << (n - 12), 2, 2, 1 << 8)
        perm = (3, 4, 2, 0, 1, 5)
        return (
            jnp.transpose(re.reshape(shape), perm).reshape(re.size),
            jnp.transpose(im.reshape(shape), perm).reshape(im.size),
        )

    cases["two_swaps_one_transpose"] = multi_swap

    def measure(fn, its) -> float:
        c = jax.jit(planar_case(fn, its)).lower().compile()
        dt = timeit(lambda: float(jax.device_get(c())), reps)
        return max((dt - FETCH_LATENCY_S) / its, 1e-9)

    out = {}
    for name, fn in cases.items():
        try:
            its, per = iters, measure(fn, iters)
            while per * its < 4 * FETCH_LATENCY_S and its < 256:
                its = min(its * 4, 256)
                per = measure(fn, its)
            out[name] = {
                "s_per_pass": round(per, 5),
                "GBs": round(2 * nbytes_planar / per / 1e9, 1),
            }
        except Exception as exc:  # pragma: no cover - device-dependent
            out[name] = {"error": str(exc)[:160]}
    return {"n": n, "cases": out}


def run(n: int = 26, *, iters: int = 8, reps: int = 3) -> dict:
    from ..circuit import library as L

    setup_platform()
    warm_grant()
    return {
        "qft": profile_schedule(L.qft(n), iters=iters, reps=reps),
        "nonstab": profile_schedule(
            L.non_stabilizer(n + 2), iters=iters, reps=reps),
        "policies": straddler_policies(n, iters=iters, reps=reps),
    }


if __name__ == "__main__":
    print(json.dumps(run(), indent=1))
