"""Out-of-core streaming throughput (host-DRAM and disk backends).

Analogue of ``wenbo_engine/bench/io.py`` + ``bench/end_to_end.py`` for
the spill tier: MB/s of state streamed through the device per applied
step, for a layered workload at a given stripe width.
"""
from __future__ import annotations

import json
import tempfile
import time

from . import setup_platform, warm_grant


def run(n: int = 22, stripe_qubits: int = 18, dtype="complex64") -> dict:
    import numpy as np

    from ..circuit import library as lib
    from ..runtime import spill

    dev = setup_platform()
    warm_grant()
    cd = lib.non_stabilizer(n, depth=2, seed=3)
    state_bytes = (1 << n) * np.dtype(dtype).itemsize
    rows = []

    t0 = time.time()
    out = spill.run_out_of_core(cd, stripe_qubits=stripe_qubits,
                                backend="host", dtype=dtype)
    host_s = time.time() - t0
    from ..circuit.fusion import compile_steps
    n_steps = len(compile_steps(cd, k=stripe_qubits))
    rows.append({
        "backend": "host", "wall_s": round(host_s, 3),
        "MB_per_s": round(state_bytes * n_steps * 2 / host_s / 1e6, 1),
        "norm": float(np.vdot(out, out).real),
    })

    with tempfile.TemporaryDirectory() as td:
        t0 = time.time()
        spill.run_out_of_core(cd, stripe_qubits=stripe_qubits,
                              backend="disk", work_dir=td, dtype=dtype)
        disk_s = time.time() - t0
        rows.append({
            "backend": "disk", "wall_s": round(disk_s, 3),
            "MB_per_s": round(state_bytes * n_steps * 2 / disk_s / 1e6, 1),
        })
    return {"n": n, "stripe_qubits": stripe_qubits, "steps": n_steps,
            "device": str(dev), "rows": rows}


def overlap(n: int = 20, stripe_qubits: int = 16, dtype="complex64") -> dict:
    """Pipelined vs synchronous spill: the I/O<->compute overlap win.

    The reference measures its reader/worker/writer pipeline against
    the single-threaded runner (``wenbo_engine/runner/pipeline.py``);
    this is the async-dispatch equivalent.
    """
    import numpy as np

    from ..circuit import library as lib
    from ..runtime import spill

    dev = setup_platform()
    warm_grant()
    cd = lib.non_stabilizer(n, depth=2, seed=3)
    out = {}
    for label, pipe in (("pipelined", True), ("synchronous", False)):
        t0 = time.time()
        st = spill.run_out_of_core(cd, stripe_qubits=stripe_qubits,
                                   backend="host", dtype=dtype,
                                   pipeline=pipe)
        out[label] = {"wall_s": round(time.time() - t0, 3),
                      "norm": float(np.vdot(st, st).real)}
    out["overlap_speedup"] = round(
        out["synchronous"]["wall_s"] / out["pipelined"]["wall_s"], 2)
    out["device"] = str(dev)
    return out


def slice_run(n: int = 40, stripe_qubits: int = 26,
              stripes_measured: int = 4, dtype="complex64") -> dict:
    """Measured slice of a 40-qubit out-of-core run + full-run extrapolation.

    A 40q complex64 state is 8 TiB (BASELINE config 5; reference
    capacity model ``wenbo_engine/docs/architecture.md:410-427``) — far
    beyond any single host, so this bench executes a representative
    SLICE: the real compiled step programs of QFT-40 at the given
    stripe width, timed over a few stripes (every stripe of a step runs
    the identical program, so per-stripe throughput is exact), then
    extrapolates the full-run wall clock from the total stripe-pass
    count.  This is the honest version of a number nobody can measure
    end to end — the reference itself stops at n=30.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..circuit import library as lib
    from ..circuit.fusion import compile_steps
    from ..runtime.simulator import apply_local_ops
    from ..runtime.spill import _group_bits, _remap_ops

    dev = setup_platform()
    warm_grant()
    m = stripe_qubits
    cd = lib.qft(n)
    steps = compile_steps(cd, k=m)
    stripe_bytes = (1 << m) * np.dtype(dtype).itemsize

    # Total stripe passes across the run (a group pass of 2^r stripes
    # counts as 2^r): every step touches the full state once.
    total_passes = len(steps) * (1 << (n - m))

    rng = np.random.default_rng(0)
    base = (rng.normal(size=1 << m) + 1j * rng.normal(size=1 << m))
    base = (base / np.linalg.norm(base)).astype(dtype)

    rows = []
    for label, step in (("local", next(s for s in steps
                                       if not s.nonlocal_ops)),
                        ("nonlocal", next(s for s in steps
                                          if s.nonlocal_ops))):
        bits = _group_bits(step, m)
        ops = _remap_ops(step, m, bits)
        r = len(bits)
        fn = jax.jit(lambda psi, ops=ops: apply_local_ops(psi, ops),
                     donate_argnums=(0,))
        group = np.concatenate([base] * (1 << r)) if r else base
        # warm (compile)
        np.asarray(fn(jnp.asarray(group, dtype=dtype)))
        t0 = time.time()
        for _ in range(stripes_measured):
            out = np.asarray(fn(jnp.asarray(group, dtype=dtype)))
        dt = (time.time() - t0) / stripes_measured
        per_stripe = dt / (1 << r)
        rows.append({
            "step_kind": label,
            "group_stripes": 1 << r,
            "stripe_GB_s": round(stripe_bytes * 2 / per_stripe / 1e9, 2),
            "per_stripe_s": round(per_stripe, 4),
        })
        del out

    mean_stripe_s = sum(x["per_stripe_s"] for x in rows) / len(rows)
    est_wall_s = mean_stripe_s * total_passes
    return {
        "n": n,
        "stripe_qubits": m,
        "state_TiB": round((1 << n) * np.dtype(dtype).itemsize / 2**40, 1),
        "steps": len(steps),
        "total_stripe_passes": total_passes,
        "device": str(dev),
        "measured": rows,
        "est_full_run_s": round(est_wall_s, 1),
        "est_full_run_h": round(est_wall_s / 3600, 2),
        "note": ("extrapolated: per-stripe wall x total passes; storage "
                 "tier (8 TiB) itself is the deployment constraint, cf. "
                 "reference capacity model architecture.md:410-427"),
    }


def real_chip(n: int = 24, stripe_qubits: int = 21, depth: int = 2,
              verify: bool = True) -> dict:
    """End-to-end out-of-core run ON REAL HARDWARE via f32 stripe I/O.

    The axon dev tunnel's DMA path lacks complex64 transfers and >=64 MB
    fetches (see :mod:`probe_transfer`), which is why earlier rounds
    could only demonstrate the spill tier on the CPU backend.
    ``transfer='f32'`` stays inside the supported envelope (f32 jit-arg
    uploads, <=32 MB per-stripe fetches), so this bench streams a full
    n-qubit state host<->HBM through every spill code path (stripes,
    stack-and-relabel groups, depth-2 pipeline) on the actual chip, then
    verifies the final state on-device against the in-HBM engine.

    The reference's closest analogue is its out-of-core e2e bench
    (``wenbo_engine/bench/end_to_end.py``); its wall clock there is
    disk-bound the same way this one is tunnel-bound — per-pass
    bandwidth, not compute, is the metric.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..circuit import library as lib
    from ..circuit.fusion import compile_steps
    from ..runtime import simulator, spill

    dev = setup_platform()
    warm_grant()
    m = stripe_qubits
    cd = lib.non_stabilizer(n, depth=depth, seed=3)
    state_bytes = (1 << n) * 8  # complex64
    steps = compile_steps(cd, k=m)
    n_group = sum(1 for s in steps if s.nonlocal_ops)

    t0 = time.time()
    out = spill.run_out_of_core(cd, stripe_qubits=m, backend="host",
                                transfer="f32")
    wall = time.time() - t0

    res = {
        "n": n, "stripe_qubits": m, "device": str(dev),
        "steps": len(steps), "group_steps": n_group,
        "state_MB": round(state_bytes / 1e6, 1),
        "wall_s": round(wall, 2),
        "MB_per_s_streamed": round(
            state_bytes * len(steps) * 2 / wall / 1e6, 1),
        "norm2": float(np.vdot(out, out).real),
        "transfer": "f32",
    }
    if verify:
        from ..ops import dense

        # State creation must happen INSIDE a jitted program on axon
        # (eager jnp.zeros of complex is UNIMPLEMENTED over the tunnel).
        init = jax.jit(lambda: dense.zero_state(n, jnp.complex64))()
        ref = simulator.simulate(cd, mode="window", initial_state=init)
        cmp = jax.jit(lambda x32, r: (
            jnp.max(jnp.abs(spill._f32_to_c64(x32) - r)),
            jnp.vdot(r, r).real.astype(jnp.float32)))
        d, rn = cmp(np.ascontiguousarray(out).view(np.float32), ref)
        res["max_abs_diff_vs_inhbm"] = float(d)
        res["ref_norm2"] = float(rn)
    return res


def real_chip_ghz(n: int = 31, stripe_qubits: int = 28) -> dict:
    """GHZ-n out-of-core ON REAL HARDWARE — beyond single-chip HBM.

    At n=31 the complex64 state is 16 GiB: it cannot exist in a
    16 GiB chip's HBM even as in-place f32 planes, so this run is only
    possible out-of-core — the state lives in host DRAM and streams
    through the device stripe by stripe (f32 transfer mode).  The
    reference's ceiling on ONE node was n=30 via 2x local disk at
    631 s (``wenbo_engine/docs/v3_comparison.md:45-62``); wall clock
    here is tunnel-bound, not compute- or design-bound (production
    hosts stream over PCIe at ~100x this dev tunnel's rate).

    GHZ gives closed-form verification without a second 2^n engine:
    exactly two amplitudes (|0..0> and |1..1>) at 1/sqrt(2), checked
    host-side along with a chunked norm2 over the full state.
    """
    import numpy as np

    from ..circuit import library as lib
    from ..circuit.fusion import compile_steps
    from ..runtime import spill

    dev = setup_platform()
    warm_grant()
    cd = lib.ghz(n)
    m = stripe_qubits
    steps = compile_steps(cd, k=m)
    state_bytes = (1 << n) * 8

    t0 = time.time()
    out = spill.run_out_of_core(cd, stripe_qubits=m, backend="host",
                                transfer="f32")
    wall = time.time() - t0

    inv = 1.0 / np.sqrt(2.0)
    norm2 = 0.0
    maxoff = 0.0  # largest |amp| outside the two GHZ poles
    chunk = 1 << 24
    for i in range(0, out.size, chunk):
        seg = out[i:i + chunk]
        p = (seg.real.astype(np.float64) ** 2
             + seg.imag.astype(np.float64) ** 2)
        if i == 0:
            p0 = p[0]
            p[0] = 0.0
        if i + chunk >= out.size:
            pN = p[-1]
            p[-1] = 0.0
        norm2 += float(p.sum()) + (p0 if i == 0 else 0.0) \
            + (pN if i + chunk >= out.size else 0.0)
        maxoff = max(maxoff, float(np.sqrt(p.max())))
    return {
        "n": n, "stripe_qubits": m, "device": str(dev),
        "steps": len(steps),
        "group_steps": sum(1 for s in steps if s.nonlocal_ops),
        "state_GiB": round(state_bytes / (1 << 30), 1),
        "wall_s": round(wall, 1),
        "MB_per_s_streamed": round(
            state_bytes * len(steps) * 2 / wall / 1e6, 1),
        "amp0_err": abs(float(np.abs(out[0])) - inv),
        "ampN_err": abs(float(np.abs(out[-1])) - inv),
        "max_offpole_amp": maxoff,
        "norm2": norm2,
        "transfer": "f32",
    }


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "slice40":
        print(json.dumps(slice_run(), indent=1))
    elif len(sys.argv) > 1 and sys.argv[1] == "overlap":
        print(json.dumps(overlap(), indent=1))
    elif len(sys.argv) > 1 and sys.argv[1] == "ghz":
        kw = {}
        if len(sys.argv) > 2:
            kw["n"] = int(sys.argv[2])
        if len(sys.argv) > 3:
            kw["stripe_qubits"] = int(sys.argv[3])
        print(json.dumps(real_chip_ghz(**kw), indent=1))
    elif len(sys.argv) > 1 and sys.argv[1] == "real":
        kw = {}
        if len(sys.argv) > 2:
            kw["n"] = int(sys.argv[2])
        if len(sys.argv) > 3:
            kw["stripe_qubits"] = int(sys.argv[3])
        print(json.dumps(real_chip(**kw), indent=1))
    else:
        print(json.dumps(run(), indent=1))
