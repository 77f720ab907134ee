"""Correctness + performance matrix over the circuit library.

Analogue of ``wenbo_engine/bench/mqt_bench_runner.py``: every family in
the library at several sizes, engine output checked against the
complex128 oracle (max |amplitude error| and phase-invariant overlap),
wall time recorded.  When qiskit is installed the external-oracle
overlap is checked too.
"""
from __future__ import annotations

import json
import time

import numpy as np

from . import setup_platform


def run(sizes=(6, 10, 14), dtype="complex64", mode="panel") -> dict:
    import jax

    from ..circuit import library as lib
    from ..oracle import dense_numpy as oracle
    from ..runtime import simulator

    dev = setup_platform()
    if dtype == "complex128":
        # x64 must be on or jnp silently downcasts; TPU has no f64.
        if "TPU" in str(dev).upper():
            raise ValueError("complex128 requires a CPU platform")
        jax.config.update("jax_enable_x64", True)
    tol = 1e-10 if dtype == "complex128" else 1e-4
    try:
        from ..circuit.import_qiskit import HAVE_QISKIT, overlap_with_qiskit
    except ImportError:
        HAVE_QISKIT = False

    rows = []
    for fam, build in lib.FAMILIES.items():
        for n in sizes:
            try:
                cd = build(n)
            except Exception as e:  # family not defined at this n
                rows.append({"family": fam, "n": n, "status": f"skip: {e}"})
                continue
            t0 = time.time()
            got = np.asarray(simulator.simulate(cd, dtype=dtype, mode=mode))
            wall = time.time() - t0
            want = oracle.simulate(cd)
            err = float(np.max(np.abs(got - want)))
            overlap = float(abs(np.vdot(want, got)))
            row = {
                "family": fam, "n": n, "gates": len(cd["gates"]),
                "wall_s": round(wall, 3), "max_err": err,
                "overlap": round(overlap, 12),
                "status": "ok" if err < tol else "MISMATCH",
            }
            if HAVE_QISKIT:
                row["qiskit_overlap"] = overlap_with_qiskit(cd, got)
            rows.append(row)
    n_bad = sum(1 for r in rows if r.get("status") == "MISMATCH")
    return {"rows": rows, "n_mismatch": n_bad}


if __name__ == "__main__":
    out = run()
    print(json.dumps(out, indent=1))
    raise SystemExit(1 if out["n_mismatch"] else 0)
