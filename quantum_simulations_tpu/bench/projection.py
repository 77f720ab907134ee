"""Projected 34-qubit random-circuit sampling on a v5p-16 pod slice.

16 real chips are not available in this environment; what IS measured
is the per-chip cost of exactly the work each pod chip would do:

* a 34q state on 16 chips = a 2^30-amplitude shard per chip — the SAME
  shard size as the measured single-chip n=30 capacity runs
  (``bench/capacity.py``, BENCH_LOCAL.json ``capacity_n30_single_chip``);
* cross-chip traffic of the staged plan is enumerable exactly: the
  stage-transition boundary SWAPs collapse into per-plane
  ``all_to_all`` reshards whose byte volume is
  shard_bytes * (1 - 2^-r) per chip (``parallel/reshard.reshard_bytes``);
* the hierarchical SPMD sampler costs one probability pass + O(shots)
  small gathers (``ops/sampling.sample_bits_sharded``).

The projection composes these three measured/analytic pieces; every
assumption is carried in the emitted row.  The program itself (window
kernels + reshards + sampler over the 16-device mesh, with plane
donation) is validated by AOT lowering in
``tests/test_pod_scale_lowering.py``.

Run: ``python -m quantum_simulations_tpu.bench.projection`` (no device
needed — this is a pure plan-and-arithmetic module).
"""
from __future__ import annotations

import json

# Per-chip effective all_to_all bandwidth assumed for the ICI ring of a
# v5p slice (conservative: a v5p chip has multiple ~100 GB/s-class ICI
# links; we budget ONE link's worth for the collective's bottleneck
# direction).  The DCN tier is not needed: a v5p-16 is a single slice.
ICI_BYTES_PER_S = 100e9

# Measured on the v5e chip (BENCH_LOCAL.json capacity_n30_single_chip,
# re-confirmed 2026-08-19): per-chip amplitude-update throughput on a
# 2^30-amplitude in-place planar shard, non-stabilizer gate mix.
MEASURED_N30_AMP_UPDATES_PER_S = 356.9e9
# v5p HBM is ~2.7 TB/s vs the v5e's ~0.82 TB/s; the window kernels are
# HBM/MXU-bound, so per-chip throughput scales with the memory system.
# Both numbers are reported; the conservative row uses the v5e rate.
V5P_OVER_V5E_HBM = 2765.0 / 819.0


def project(n: int = 34, n_chips: int = 16, depth: int = 8,
            shots: int = 1_000_000, seed: int = 7) -> dict:
    import numpy as np

    from ..circuit import library as lib
    from ..circuit import staging as S
    from ..circuit.fusion import compile_steps
    from ..parallel.reshard import plan_boundary_reshard

    k = n - int(np.log2(n_chips))
    cd = lib.sycamore_like(n, depth=depth, seed=seed)
    staged, _, st = S.stage_circuit(cd, k, "heuristic")
    steps = compile_steps(staged, k=k, panel_width=None)

    shard_amps = 1 << k
    shard_bytes = shard_amps * 8  # two f32 planes

    # Exchange bytes per chip: boundary reshards (exact all_to_all
    # volume) + any residual per-gate exchanges (none after staging;
    # counted anyway for honesty).
    from ..ops.exchange import exchange_bytes

    reshard_bytes_total = 0
    residual_bytes = 0
    n_reshards = 0
    for s in steps:
        pairs, rest = plan_boundary_reshard(s.nonlocal_ops, k)
        if pairs:
            r = len(pairs)
            reshard_bytes_total += shard_bytes - (shard_bytes >> r)
            n_reshards += 1
        for op in rest:
            residual_bytes += exchange_bytes(
                np.asarray(op.U), tuple(op.qubits), k)

    gates = len(staged["gates"])
    local_s_v5e = gates * shard_amps / MEASURED_N30_AMP_UPDATES_PER_S
    comm_s = (reshard_bytes_total + residual_bytes) / ICI_BYTES_PER_S
    # Sampler: one fused probability pass over the planes + tiny
    # all_gather/categorical work (measured sub-10ms at n=30 scales).
    sample_s = shard_bytes / 819e9

    total_v5e_rate = local_s_v5e + comm_s + sample_s
    total_v5p = local_s_v5e / V5P_OVER_V5E_HBM + comm_s + sample_s

    return {
        "config": f"PROJECTED sycamore-like n={n} sampling on "
                  f"{n_chips} chips (v5p-16 target)",
        "method": (
            "per-chip local time = staged gate count x 2^30 shard amps "
            "/ MEASURED single-chip n=30 in-place planar rate "
            f"({MEASURED_N30_AMP_UPDATES_PER_S/1e9:.0f}G amp-updates/s "
            "on v5e, BENCH_LOCAL capacity rows); comm = exact all_to_all "
            f"reshard bytes @ {ICI_BYTES_PER_S/1e9:.0f} GB/s ICI; "
            "sampler = one probability pass. Program validated by AOT "
            "lowering over a 16-device mesh with plane donation "
            "(tests/test_pod_scale_lowering.py). NOT a hardware timing."
        ),
        "gates_staged": gates,
        "stages": st["stages"],
        "boundary_reshards": n_reshards,
        "reshard_gib_per_chip": round(reshard_bytes_total / 2**30, 2),
        "residual_exchange_bytes": residual_bytes,
        "local_s_at_v5e_rate": round(local_s_v5e, 3),
        "comm_s": round(comm_s, 3),
        "sample_s": round(sample_s, 4),
        "projected_total_s_v5e_rate": round(total_v5e_rate, 3),
        "projected_total_s_v5p_hbm_scaled": round(total_v5p, 3),
        "shots": shots,
        "note": (
            "the reference cannot run n=34 at all (its ceiling is n=30 "
            "out-of-core, 631 s); this row exists to size the BASELINE "
            "34q target, with the methodology stated"
        ),
    }


def run() -> dict:
    row = project()
    print(json.dumps(row, indent=1))
    return row


if __name__ == "__main__":
    run()
