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


def shard_timing(n: int = 30, n_devices: int = 8, *, depth: int = 8,
                 reps: int = 3, ici_GBs: float = 100.0,
                 interpret: bool | None = None) -> dict:
    """Measured per-shard timing of the n=30 sharded config on ONE real chip.

    The virtual-CPU mesh demonstrates correctness but not wall-clock
    (a 1-core host serializes 8 shards of 1 GiB each).  This runs the
    per-device HALF of the real program on the actual TPU: every
    step's local window ops over one 2^(n-log2(P)) shard, chained
    in-program with barriers — exactly what each of the 8 chips
    executes between collectives.  The collective half is accounted
    exactly (``exchange.offset_traffic`` per nonlocal op x shard
    bytes) and converted to time with a configurable ICI bandwidth, so
    the reported pod estimate = measured shard compute + accounted ICI
    time.  Reference analogue: ``svsim-mpi.hpp`` rank compute + the
    MPI exchange volume of ``mpi_redistributer.hpp:266-340``.
    """
    import math

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..circuit import library as lib
    from ..circuit.fusion import compile_steps
    from ..circuit.panelize import compile_window_ops
    from ..ops import pallas_kernels as pk
    from ..ops.exchange import offset_traffic
    from ..runtime.simulator import apply_window_op
    from . import timeit, warm_grant

    dev = setup_platform()
    warm_grant()
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    d = int(math.log2(n_devices))
    k = n - d
    cd = lib.sycamore_like(n, depth=depth, seed=11)
    steps = compile_steps(cd, k=k)

    terms_only = k >= 10
    win_ops = [
        compile_window_ops(
            [(op.qubits, op.U, getattr(op, "name", "panel"))
             for op in s.local_ops],
            k, diag_terms_only=terms_only)
        for s in steps
    ]

    # Exact ICI accounting: bytes each chip sends per nonlocal op.
    shard_bytes = (1 << k) * 8  # complex64
    n_collectives = 0
    ici_bytes = 0.0
    for s in steps:
        for op in s.nonlocal_ops:
            for _off, frac in offset_traffic(
                    np.asarray(op.U), tuple(op.qubits), k):
                n_collectives += 1
                ici_bytes += frac * shard_bytes

    def prog():
        key = jax.random.PRNGKey(0)
        re = jax.random.normal(key, (1 << k,), jnp.float32) * 1e-4
        im = jnp.zeros((1 << k,), jnp.float32)
        for wops in win_ops:
            for op in wops:
                re, im = apply_window_op(re, im, op, jnp.complex64,
                                         interpret)
            re, im = jax.lax.optimization_barrier((re, im))
        return jnp.sum(re * 1e-9) + jnp.sum(im * 1e-9)

    c = jax.jit(prog).lower().compile()
    shard_s = timeit(lambda: float(jax.device_get(c())), reps)

    ici_s = ici_bytes / (ici_GBs * 1e9)
    local_passes = sum(len(w) for w in win_ops)
    return {
        "device": str(dev),
        "config": f"sycamore{n}_d{depth}_{n_devices}shards",
        "n": n,
        "n_devices": n_devices,
        "shard_amplitudes": 1 << k,
        "gates": len(cd["gates"]),
        "steps": len(steps),
        "local_window_passes": local_passes,
        "measured_shard_compute_s": round(shard_s, 4),
        "collectives": n_collectives,
        "ici_bytes_per_chip": int(ici_bytes),
        "ici_model_GBs": ici_GBs,
        "accounted_ici_s": round(ici_s, 4),
        "pod_estimate_s": round(shard_s + ici_s, 4),
        "note": ("shard compute measured on the real chip; ICI time is "
                 "exact bytes over a conservative per-chip bandwidth "
                 "model (v5e ICI 2x186 GB/s links; 100 GB/s assumed "
                 "effective)"),
    }


if __name__ == "__main__":
    import os
    import sys

    if "shard_timing" in sys.argv[1:]:
        ns = [int(a) for a in sys.argv[1:] if a.isdigit()]
        print(json.dumps(shard_timing(ns[0] if ns else 30), indent=1))
        raise SystemExit(0)

    os.environ.setdefault(
        "XLA_FLAGS",
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8")
    os.environ.setdefault("QST_BENCH_PLATFORM", "cpu")
    ns = [int(a) for a in sys.argv[1:] if a.isdigit()]
    only = tuple(a for a in sys.argv[1:] if not a.isdigit())
    print(json.dumps(run(*(ns or [30]), only=only), indent=1))
