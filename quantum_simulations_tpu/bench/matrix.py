"""Cross-tier differential correctness x perf matrix (MQT-bench style).

Every circuit family in the library is run through EVERY applicable
execution tier and checked against the complex128 numpy oracle — the
framework's own tiers act as mutually-independent oracles (the native
C++ engine is a fully separate implementation, so this is the
dual-oracle validation the reference gets from Qiskit in
``wenbo_engine/bench/mqt_bench_runner.py:28-105`` and
``tests/test_qiskit_oracle.py:22-68``; qiskit is used too when
installed).

Tiers:
  oracle   numpy complex128 reference (ground truth)
  native   C++/OpenMP host engine (independent implementation)
  fused    jnp per-gate traced program
  window   planar Pallas fixed-window schedule
  panel    rotating-panel schedule
  sharded  shard_map over an 8-device mesh (virtual on CPU)
  spill    out-of-core host-stripe runner
  sparse   COO engine (dense export for comparison)

Run on CPU (deterministic, complex128-capable): tolerance 1e-10.
"""
from __future__ import annotations

import json
import time

import numpy as np

from . import setup_platform

TOL_C128 = 1e-10
TOL_C64 = 1e-4

# Size caps per tier: spill/sparse are exercised for correctness, not
# capacity, and the sparse engine is dense-workload-hostile by design.
SPARSE_MAX_NNZ = 1 << 18


def _tiers(n: int, dtype, mesh):
    """tier name -> callable(cd) returning a dense numpy state."""
    import jax.numpy as jnp

    from ..oracle import native as native_oracle
    from ..parallel import executor as E
    from ..runtime import simulator, spill

    np_dtype = np.complex128 if dtype == jnp.complex128 else np.complex64

    tiers = {}
    if native_oracle.available():
        tiers["native"] = lambda cd: native_oracle.simulate(
            cd, dtype=np_dtype)
    tiers["fused"] = lambda cd: np.asarray(
        simulator.simulate(cd, dtype=dtype, mode="fused"))
    tiers["window"] = lambda cd: np.asarray(
        simulator.simulate(cd, dtype=dtype, mode="window"))
    tiers["panel"] = lambda cd: np.asarray(
        simulator.simulate(cd, dtype=dtype, mode="panel"))
    if mesh is not None and (1 << n) >= 8 * 128:
        tiers["sharded"] = lambda cd: E.collect_state(
            E.simulate_sharded(mesh, cd, dtype=dtype))
    if n <= 18:
        tiers["spill"] = lambda cd: np.asarray(spill.run_out_of_core(
            cd, stripe_qubits=max(n - 2, 4), backend="host", dtype=dtype))
    return tiers


def _sparse_state(cd, n):
    from ..sparse.engine import simulate_sparse

    st = simulate_sparse(cd)
    if len(st) > SPARSE_MAX_NNZ:
        return None
    return st.to_dense()


def run(sizes=(8, 12, 16), dtype_name="complex128", families=None,
        with_sharded: bool = True) -> dict:
    import jax

    from ..circuit import library as lib
    from ..oracle import dense_numpy as oracle

    dev = setup_platform()
    on_tpu = "TPU" in str(dev).upper()
    if dtype_name == "complex128":
        if on_tpu:
            raise ValueError("complex128 matrix requires a CPU platform")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    dtype = jnp.complex128 if dtype_name == "complex128" else jnp.complex64
    tol = TOL_C128 if dtype_name == "complex128" else TOL_C64

    mesh = None
    if with_sharded and len(jax.devices()) >= 8:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(8)

    fams = families or list(lib.FAMILIES)
    rows = []
    for fam in fams:
        build = lib.FAMILIES[fam]
        for n in sizes:
            try:
                cd = build(n)
            except Exception as e:
                rows.append({"family": fam, "n": n, "status": f"skip: {e}"})
                continue
            n_actual = cd["number_of_qubits"]  # fixed-size families (bell)
            want = oracle.simulate(cd)
            row = {"family": fam, "n": n_actual, "gates": len(cd["gates"]),
                   "tiers": {}, "status": "ok"}
            for tier, fn in _tiers(n_actual, dtype, mesh).items():
                t0 = time.time()
                try:
                    got = fn(cd)
                except Exception as e:
                    row["tiers"][tier] = {"error": str(e)[:120]}
                    row["status"] = "ERROR"
                    continue
                err = float(np.max(np.abs(np.asarray(got) - want)))
                row["tiers"][tier] = {
                    "max_err": err,
                    "wall_s": round(time.time() - t0, 3),
                }
                if err >= tol:
                    row["status"] = "MISMATCH"
            sp = _sparse_state(cd, n_actual)
            if sp is not None:
                err = float(np.max(np.abs(sp - want)))
                row["tiers"]["sparse"] = {"max_err": err}
                if err >= tol:
                    row["status"] = "MISMATCH"
            rows.append(row)
    n_bad = sum(1 for r in rows if r["status"] in ("MISMATCH", "ERROR"))
    return {
        "dtype": dtype_name,
        "tol": tol,
        "rows": rows,
        "n_bad": n_bad,
        "tiers_seen": sorted({t for r in rows for t in r.get("tiers", {})}),
    }


if __name__ == "__main__":
    import sys

    sizes = tuple(int(a) for a in sys.argv[1:]) or (8, 12, 16)
    out = run(sizes=sizes)
    print(json.dumps(out, indent=1))
    raise SystemExit(1 if out["n_bad"] else 0)
