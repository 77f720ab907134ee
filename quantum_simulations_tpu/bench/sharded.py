"""Sharded-tier benchmark: the 30-qubit mesh configs (BASELINE config 3).

Runs the sharded executor over an 8-way mesh.  On this machine the mesh
is 8 *virtual CPU devices* (``xla_force_host_platform_device_count``),
so the numbers demonstrate CORRECTNESS and the collective structure at
the target scale (n=30 across 8 shards of 2^27 amplitudes — the real
multi-chip memory layout), not TPU wall-clock; on a v5p pod the same
program runs with ICI collectives.  Reference analogue: the Spark
``local[2]`` stand-in for cluster execution
(``wenbo_engine/tests/test_spark_runner_small.py:27-44``) + the MPI
tier (``hisvsim_repo/svsim-mpi.hpp``).

Run: ``python -m quantum_simulations_tpu.bench.sharded [n]``.
"""
from __future__ import annotations

import json
import time

from . import setup_platform


def run(n: int = 30, *, with_window_row: bool = True,
        only: tuple = ()) -> dict:
    import jax
    import numpy as np

    dev = setup_platform()  # must run before any device discovery
    if len(jax.devices()) < 8:
        # the 8-way virtual mesh needs XLA_FLAGS=
        # --xla_force_host_platform_device_count=8 before backend init
        # (the module __main__ sets it; see tests/conftest.py).
        return {"error": f"need 8 devices, have {len(jax.devices())}"}
    import jax.numpy as jnp

    from ..circuit import library as lib
    from ..oracle import dense_numpy as oracle
    from ..parallel import executor as E
    from ..parallel.mesh import make_mesh

    mesh = make_mesh(8)
    rows = []

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)  # timeout-safe streaming

    def wanted(tag: str) -> bool:
        return not only or tag in only

    # --- GHZ at the target n: analytic correctness at scale ---------
    if wanted("ghz"):
        cd = lib.ghz(n)
        t0 = time.time()
        psi = E.simulate_sharded(mesh, cd)
        a0 = complex(psi[0])
        aN = complex(psi[(1 << n) - 1])
        wall = time.time() - t0
        inv = 1 / np.sqrt(2)
        emit({
            "config": f"ghz{n}_sharded8",
            "gates": len(cd["gates"]),
            "wall_s": round(wall, 2),
            "amp0_err": round(abs(a0 - inv), 9),
            "ampN_err": round(abs(aN - inv), 9),
            "shard_amplitudes": 1 << (n - 3),
        })
        del psi

    # --- random 2q-heavy circuit at the target n: norm at scale -----
    if wanted("sycamore"):
        cd = lib.sycamore_like(n, depth=2, seed=11)
        t0 = time.time()
        psi = E.simulate_sharded(mesh, cd)
        norm2 = float(jnp.sum(jnp.abs(psi) ** 2))
        wall = time.time() - t0
        emit({
            "config": f"sycamore{n}_d2_sharded8",
            "gates": len(cd["gates"]),
            "wall_s": round(wall, 2),
            "norm2": round(norm2, 6),
        })
        del psi

    # --- oracle-exact row at checkable size, both shard modes -------
    if wanted("oracle"):
        cd = lib.sycamore_like(14, depth=4, seed=3)
        want = oracle.simulate(cd)
        for mode in (("fused",) + (("window",) if with_window_row else ())):
            t0 = time.time()
            got = E.collect_state(E.simulate_sharded(
                mesh, cd, dtype=jnp.complex128, mode=mode))
            emit({
                "config": f"sycamore14_d4_sharded8_{mode}",
                "wall_s": round(time.time() - t0, 2),
                "max_err_vs_oracle": float(np.max(np.abs(got - want))),
            })

    return {"device": str(dev), "n_devices": 8, "rows": rows}


if __name__ == "__main__":
    import os
    import sys

    os.environ.setdefault(
        "XLA_FLAGS",
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8")
    os.environ.setdefault("QST_BENCH_PLATFORM", "cpu")
    ns = [int(a) for a in sys.argv[1:] if a.isdigit()]
    only = tuple(a for a in sys.argv[1:] if not a.isdigit())
    print(json.dumps(run(*(ns or [30]), only=only), indent=1))
