"""Large-n complex128 differential vs the numpy oracle.

Closes the BASELINE "1e-10 amplitude match at 28q" evidence gap: the
dual-oracle matrix (`bench/matrix.py`) validates every tier at 1e-10
for n in (8, 11); this probe pushes the SAME double-precision
differential to the largest n tractable on the dev host (one CPU
core), gate-for-gate against the independent numpy oracle
(`oracle/dense_numpy.py`).  The reference makes the equivalent claim
from its Qiskit cross-check (`wenbo_engine/tests/test_qiskit_oracle.py`)
plus a 28q run; on this host a full n=28 double run is compute-bound
(>15 min/pass), so the probe runs n=22/24 end-to-end and, for n=28,
a segmented differential: K circuit segments, each applied by BOTH
engines to the same random-state restart, so every gate of a 28q
circuit is still checked at c128 without either engine drifting.

Usage (the CPU backend and x64 are forced via jax.config — on this
image the JAX_PLATFORMS env var hangs the sitecustomize jax preload,
so do NOT set it):

    python -m quantum_simulations_tpu.bench.c128_diff \
        --sizes 22,24 --families qft,nonstab

Prints one JSON line per (family, n) with max |amp diff| and norm
error, and a summary verdict against the 1e-10 bar.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _rand_state(n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    psi = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    return (psi / np.linalg.norm(psi)).astype(np.complex128)


def run(sizes=(22, 24), families=("qft", "nonstab"),
        segmented_n: int | None = None, segment_gates: int = 64,
        max_segments: int | None = None, seed: int = 7) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from ..circuit import library as lib
    from ..oracle import dense_numpy as oracle
    from ..runtime import simulator

    rows = []
    for fam in families:
        build = lib.FAMILIES[fam]
        for n in sizes:
            cd = build(n)
            t0 = time.time()
            got = simulator.simulate_np(cd, dtype="complex128")
            t_fw = time.time() - t0
            t0 = time.time()
            want = oracle.simulate(cd)
            t_or = time.time() - t0
            row = {
                "family": fam, "n": int(cd["number_of_qubits"]),
                "gates": len(cd["gates"]),
                "max_amp_err": float(np.max(np.abs(got - want))),
                "norm2_err": float(abs(np.vdot(got, got).real - 1.0)),
                "framework_s": round(t_fw, 2), "oracle_s": round(t_or, 2),
                "mode": "end_to_end",
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    # Segmented differential at the headline size: restart both engines
    # from the same random state every `segment_gates` gates.  Each
    # segment is an independent c128 check of those exact gates at the
    # full 2^n dimension; restarting bounds single-core wall-clock per
    # segment while still covering EVERY gate of the circuit.
    # ``max_segments`` samples that many evenly-spaced segments instead
    # of all of them (the dev host has one CPU core; a full 28q sweep
    # is hours) — the row records exactly which were checked.
    if segmented_n is not None:
        for fam in families:
            cd = lib.FAMILIES[fam](segmented_n)
            gates = cd["gates"]
            worst = 0.0
            n_seg = -(-len(gates) // segment_gates)
            if max_segments is not None and max_segments < n_seg:
                idxs = [round(i * (n_seg - 1) / (max_segments - 1))
                        for i in range(max_segments)] if max_segments > 1 \
                    else [0]
                idxs = sorted(set(idxs))
            else:
                idxs = list(range(n_seg))
            t0 = time.time()
            for s in idxs:
                seg = gates[s * segment_gates:(s + 1) * segment_gates]
                sub = {"number_of_qubits": segmented_n, "gates": seg}
                psi0 = _rand_state(segmented_n, seed + s)
                got = simulator.simulate_np(
                    sub, dtype="complex128", initial_state=psi0)
                want = oracle.simulate(sub, initial_state=psi0)
                err = float(np.max(np.abs(got - want)))
                worst = max(worst, err)
                print(json.dumps({"family": fam, "n": segmented_n,
                                  "segment": s, "segments": n_seg,
                                  "gates": len(seg),
                                  "max_amp_err": err}), flush=True)
            rows.append({
                "family": fam, "n": segmented_n, "gates": len(gates),
                "segments": n_seg, "segments_checked": idxs,
                "max_amp_err": worst,
                "framework_s": round(time.time() - t0, 2),
                "mode": f"segmented_restart[{segment_gates}]",
            })
            print(json.dumps(rows[-1]), flush=True)

    worst = max(r["max_amp_err"] for r in rows)
    out = {"rows": rows, "worst_amp_err": worst, "tol": 1e-10,
           "met": bool(worst < 1e-10)}
    print(json.dumps({"worst_amp_err": worst, "met": out["met"]}))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="22,24")
    ap.add_argument("--families", default="qft,nonstab")
    ap.add_argument("--segmented-n", type=int, default=None)
    ap.add_argument("--segment-gates", type=int, default=64)
    ap.add_argument("--max-segments", type=int, default=None)
    a = ap.parse_args()
    sizes = tuple(int(s) for s in a.sizes.split(",") if s)
    run(sizes=sizes, families=tuple(a.families.split(",")),
        segmented_n=a.segmented_n, segment_gates=a.segment_gates,
        max_segments=a.max_segments)


if __name__ == "__main__":
    main()
