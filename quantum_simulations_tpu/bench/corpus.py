"""QASMBench cluster-corpus ingestion + differential matrix.

The reference *executes* the ~60-circuit QASMBench corpus
(`v3_hisvsim_spark/hisvsim_repo/QASMBench/cluster/`, driven by
`qasm_assembler_standalone.py:1768` ``execute_qasm_parts`` with
``verify_compute:716``).  This bench parses EVERY corpus file through
:mod:`circuit.import_qasm` and verifies each circuit against an
independent oracle under a per-size policy, emitting one matrix row per
circuit: ``parsed / verified / skipped`` with method and reason.

Verification policies (all double precision, tol 1e-10):

``e2e``        n <= 20 — full end-to-end c128 differential vs the numpy
               oracle, across the fused AND window tiers (and the
               8-virtual-device sharded tier for a spot subset).
``segments``   21 <= n <= 31 — sampled segment restarts: K evenly-spaced
               windows of S gates; both engines start from the same
               random c128 state at the FULL 2^n dimension, so every
               checked gate is a genuine n-qubit c128 check (same
               methodology as bench/c128_diff.py; full e2e at these n
               is days on the one-core dev host).
``trajectory`` non-unitary circuits (reset / mid-circuit measure / if):
               full oracle-twin trajectory where tractable, else
               segment checks on the unitary runs between boundaries.
               NOTE: the reference cannot run these at all — it DROPS
               ``reset`` (qasm_assembler_standalone.py:525) and cannot
               parse ``if``.
``classical``  X/CX/CCX-only circuits (e.g. adder_n37): the sparse tier
               runs them exactly (basis states, nnz=1) at ANY n and is
               checked against a 20-line classical bit simulator.
``parse_only`` states whose c128 twin exceeds host RAM (n >= 32 dense
               non-classical): recorded with the skip reason.

Usage::

    python -m quantum_simulations_tpu.bench.corpus --tier small
    python -m quantum_simulations_tpu.bench.corpus --tier segments --max-n 28
    python -m quantum_simulations_tpu.bench.corpus --tier all --update-bench-local
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

CLUSTER = os.environ.get(
    "QST_QASMBENCH",
    "/root/reference/v3_hisvsim_spark/hisvsim_repo/QASMBench/cluster")

TOL = 1e-10
_CLASSICAL = frozenset({"X", "CNOT", "CCX"})


def discover() -> list[tuple[str, str]]:
    """(name, path) for every unique .qasm in the corpus tree."""
    out, seen = [], set()
    for root, _dirs, files in os.walk(CLUSTER):
        for f in sorted(files):
            if f.endswith(".qasm") and f[:-5] not in seen:
                seen.add(f[:-5])
                out.append((f[:-5], os.path.join(root, f)))
    return sorted(out)


def parse_one(path: str) -> tuple[dict | None, str, str]:
    """-> (circuit_dict | None, mode, error)."""
    from ..circuit.import_qasm import QasmError, qasm_to_dict

    src = open(path).read()
    try:
        return qasm_to_dict(src), "unitary", ""
    except QasmError:
        pass
    try:
        return qasm_to_dict(src, nonunitary="trajectory"), "trajectory", ""
    except QasmError as e:
        return None, "", str(e)


def _policy(name: str, cd: dict, mode: str) -> str:
    n = cd["number_of_qubits"]
    if mode == "trajectory":
        return "trajectory"
    if all(g["gate"] in _CLASSICAL for g in cd["gates"]):
        return "classical"
    if n <= 20:
        return "e2e"
    if n <= 31:
        return "segments"
    return "parse_only"


def _rand_state(n: int, seed: int) -> np.ndarray:
    """Normalized random c128 state with a 1x-state memory peak.

    Fills the interleaved (re, im) float64 view in place — the naive
    ``normal() + 1j*normal()`` peaks at 3x state (96 GiB extra at
    n = 31 on the 125 GB host)."""
    rng = np.random.default_rng(seed)
    psi = np.empty(1 << n, np.complex128)
    v = psi.view(np.float64)
    rng.random(out=v)  # uniform: ~5x faster than normal at 2^32 draws
    v -= 0.5           # full-support generic state; Haar-ness is not
    psi /= np.linalg.norm(v)  # needed for an amplitude differential
    return psi


def _seg_plan(n_gates: int, n: int, seg_gates: int | None = None,
              k: int | None = None) -> tuple[int, list[int]]:
    """Segment size + evenly-spaced segment indices, scaled so the
    one-core c128 cost stays bounded as n grows.

    Cost tradeoff (ADVICE r4 #3): each sampled segment costs one
    2^n c128 twin generation + `seg_gates` lean-oracle gates (~25-40
    min at n = 30-31 on this host), so the default K drops to 1 there
    — 12 genuinely n-qubit gates checked per circuit.  Pass
    ``--seg-k``/``--seg-gates`` to widen coverage when wall-clock
    allows; the verification METHOD is identical at any K."""
    if seg_gates is None:
        seg_gates = 32 if n <= 26 else (24 if n <= 28 else 12)
    if k is None:
        k = 6 if n <= 26 else (4 if n <= 28 else (2 if n <= 29 else 1))
    n_seg = -(-n_gates // seg_gates)
    if k >= n_seg:
        return seg_gates, list(range(n_seg))
    if k == 1:
        return seg_gates, [n_seg // 2]
    idxs = sorted({round(i * (n_seg - 1) / (k - 1)) for i in range(k)})
    return seg_gates, idxs


def _verify_e2e(name: str, cd: dict, spot_sharded: bool) -> dict:
    from ..oracle import dense_numpy as oracle
    from ..runtime import simulator

    t0 = time.time()
    want = oracle.simulate(cd)
    errs = {}
    for tier in ("pergate", "fused", "window"):
        got = simulator.simulate_np(
            cd, dtype="complex128",
            mode="fused" if tier == "pergate" else tier,
            use_fusion=tier != "pergate",
            panel_width=None if tier == "pergate" else 7)
        errs[tier] = float(np.max(np.abs(got - want)))
    if spot_sharded:
        import jax

        if len(jax.devices()) >= 8:
            from ..parallel import executor as E
            from ..parallel import mesh as M

            mesh = M.make_mesh(8)
            got = np.asarray(E.simulate_sharded(
                mesh, cd, dtype="complex128"))
            errs["sharded8"] = float(np.max(np.abs(got - want)))
    worst = max(errs.values())
    return {"method": "e2e_c128", "tiers": errs, "max_amp_err": worst,
            "status": "verified" if worst < TOL else "FAILED",
            "wall_s": round(time.time() - t0, 2)}


def _verify_segments(name: str, cd: dict, seg_gates=None, k=None) -> dict:
    from ..oracle import dense_numpy as oracle
    from ..runtime import simulator

    n, gates = cd["number_of_qubits"], cd["gates"]
    seg_gates, idxs = _seg_plan(len(gates), n, seg_gates, k)
    t0, worst = time.time(), 0.0
    # Memory + speed discipline (c128 twins are 1-32 GiB each here;
    # the classic oracle's per-gate index/gather temporaries would
    # swap or OOM the 125 GB host at n >= 29, and cost ~10 s/gate at
    # n = 26): hand the ENGINE (production fused tier, the path users
    # run) a jax buffer and drop the numpy twin, regenerate psi0
    # deterministically for the oracle, run the oracle IN PLACE
    # (apply_gate_lean: O(MB) temps, diag/permutation fast paths),
    # and take the max-|diff| in chunks.
    import jax.numpy as jnp

    import tempfile

    big = n >= int(os.environ.get("QST_SEG_DISK_MIN", "31"))
    # c128 twins are 32 GiB each at n=31: the jax result plus
    # its numpy copy plus the regenerated oracle state peaked at
    # ~130 GB and OOM-killed the n=31 rows — stream the engine result
    # through a disk memmap in chunks so at most ONE full-state array
    # is RAM-resident at a time (120 GB free on /).
    step = 1 << 24
    for s in idxs:
        seg = gates[s * seg_gates:(s + 1) * seg_gates]
        sub = {"number_of_qubits": n, "gates": seg}
        x = jnp.asarray(_rand_state(n, 1000 + s))
        # donate_input: x is dead after this call; without donation the
        # non-donated c128 chain holds ~4 co-live states (128 GiB at
        # n=31) and the row is OOM-killed on the 125 GB host.  Big rows
        # additionally compile the segment as several short donated
        # sub-programs (segment_gates): one 12-gate program's XLA
        # buffer liveness still exceeded 125 GB for some gate mixes
        # (qnn_n31); 4-gate chunks bound it at ~2 states.
        g = simulator.simulate(sub, dtype="complex128",
                               use_fusion=True, panel_width=7,
                               mode="fused", initial_state=x,
                               donate_input=True,
                               segment_gates=(int(os.environ.get(
                                   "QST_SEG_ENGINE_CHUNK", "4"))
                                   if big else None))
        del x
        if big:
            tmp = tempfile.NamedTemporaryFile(
                dir=os.environ.get("QST_SCRATCH", "/tmp"), delete=False)
            got = np.memmap(tmp.name, dtype=np.complex128, mode="w+",
                            shape=(1 << n,))
            for i in range(0, 1 << n, step):
                got[i:i + step] = np.asarray(g[i:i + step])
            got.flush()
        else:
            got = np.asarray(g)
        del g
        psi0 = _rand_state(n, 1000 + s)
        want = oracle.simulate_lean(sub, initial_state=psi0)  # aliases
        m = 0.0
        for i in range(0, got.size, step):
            m = max(m, float(np.max(np.abs(got[i:i + step]
                                           - want[i:i + step]))))
        worst = max(worst, m)
        del got, want, psi0
        if big:
            os.unlink(tmp.name)
    n_seg = -(-len(gates) // seg_gates)
    return {"method": f"segment_restart_c128[{seg_gates}]_fusedtier",
            "segments_checked": idxs, "segments_total": n_seg,
            "gates_checked": min(len(gates), len(idxs) * seg_gates),
            "max_amp_err": worst,
            "status": "verified" if worst < TOL else "FAILED",
            "wall_s": round(time.time() - t0, 2)}


def _verify_trajectory(name: str, cd: dict, full_n_max: int | None = None,
                       seeds=(0, 1)) -> dict:
    """Full oracle-twin trajectory when 2^n c128 twins fit comfortably;
    otherwise segment checks on the unitary runs between boundaries.

    ``QST_TRAJ_FULL_NMAX`` overrides the full-twin size cutoff (the
    n=28 default costs ~2 h/row on the 1-core host for 139-gate
    trajectory circuits — the unitary-runs segment method is the
    wall-clock fallback at identical per-gate rigor)."""
    if full_n_max is None:
        full_n_max = int(os.environ.get("QST_TRAJ_FULL_NMAX", "28"))
    import jax.numpy as jnp

    from ..oracle import dense_numpy as oracle
    from ..runtime import trajectory as T

    n, gates = cd["number_of_qubits"], cd["gates"]
    t0 = time.time()
    if n <= full_n_max and len(gates) <= 400:
        worst = 0.0
        for seed in seeds:
            psi, cregs, outs = T.simulate_trajectory(
                cd, seed=seed, dtype=jnp.complex128,
                use_fusion=True, panel_width=7)  # production fused tier
            want, cregs_o, outs_o = oracle.simulate_trajectory(cd, seed=seed)
            if outs != outs_o or cregs != cregs_o:
                return {"method": "trajectory_twin_c128",
                        "status": "FAILED",
                        "detail": "outcome/creg divergence",
                        "wall_s": round(time.time() - t0, 2)}
            worst = max(worst, float(np.max(np.abs(np.asarray(psi) - want))))
            del psi, want
        return {"method": "trajectory_twin_c128", "seeds": list(seeds),
                "boundaries": sum(g["gate"] in ("RESET", "MEASURE")
                                  for g in gates),
                "max_amp_err": worst,
                "status": "verified" if worst < TOL else "FAILED",
                "wall_s": round(time.time() - t0, 2)}
    if n >= 32:
        return {"method": "parse_only", "status": "skipped",
                "reason": f"c128 twin needs {3 * 16 * (1 << n) >> 30} GiB "
                          "host RAM (>125); trajectory-runnable at c64 "
                          "via spill tier",
                "wall_s": round(time.time() - t0, 2)}
    # unitary-run segment checks: the gates between boundaries are
    # ordinary unitaries — sample segments from the longest runs.
    runs = [r for r, _b in T.split_segments(cd["gates"]) if len(r) >= 4]
    runs.sort(key=len, reverse=True)
    sub_gates = [dict(g, **{}) for r in runs[:3] for g in r]
    for g in sub_gates:
        g.pop("cond", None)
    res = _verify_segments(name, {"number_of_qubits": n,
                                  "gates": sub_gates})
    res["method"] = "unitary_runs_" + res["method"]
    res["note"] = (f"{len(runs)} unitary runs between "
                   "reset/measure boundaries; longest 3 sampled")
    return res


def _classical_oracle(cd: dict) -> int:
    """Bit-level simulator for X/CX/CCX circuits on |0...0>."""
    bits = 0
    for g in cd["gates"]:
        q = g["qubits"]
        if g["gate"] == "X":
            bits ^= 1 << q[0]
        elif g["gate"] == "CNOT":
            if bits >> q[0] & 1:
                bits ^= 1 << q[1]
        elif g["gate"] == "CCX":
            if (bits >> q[0] & 1) and (bits >> q[1] & 1):
                bits ^= 1 << q[2]
        else:  # pragma: no cover
            raise ValueError(g["gate"])
    return bits


def _verify_classical(name: str, cd: dict) -> dict:
    from ..sparse.engine import simulate_sparse

    t0 = time.time()
    st = simulate_sparse(cd)
    want = _classical_oracle(cd)
    items = list(st.items())
    ok = (len(items) == 1 and int(items[0][0]) == want
          and abs(complex(items[0][1]) - 1.0) < TOL)
    return {"method": "sparse_exact_vs_classical_oracle",
            "basis_state": hex(want), "nnz": len(items),
            "status": "verified" if ok else "FAILED",
            "wall_s": round(time.time() - t0, 2)}


def verify_one(name: str, path: str, *, spot_sharded: bool = False,
               seg_gates=None, seg_k=None, parsed=None) -> dict:
    cd, mode, err = parsed if parsed is not None else parse_one(path)
    row = {"circuit": name}
    if cd is None:
        row.update(status="PARSE_FAIL", error=err)
        return row
    row.update(n=cd["number_of_qubits"], gates=len(cd["gates"]), mode=mode)
    pol = _policy(name, cd, mode)
    try:
        if pol == "e2e":
            row.update(_verify_e2e(name, cd, spot_sharded))
        elif pol == "segments":
            row.update(_verify_segments(name, cd, seg_gates, seg_k))
        elif pol == "trajectory":
            row.update(_verify_trajectory(name, cd))
        elif pol == "classical":
            row.update(_verify_classical(name, cd))
        else:
            row.update(
                method="parse_only", status="skipped",
                reason=f"c128 twin needs {3 * 16 * (1 << row['n']) >> 30} "
                       "GiB host RAM (>125); runnable at c64 via spill "
                       "tier")
    except MemoryError:
        row.update(status="skipped", reason="MemoryError on dev host")
    return row


def run(tier: str = "small", max_n: int | None = None,
        names: list[str] | None = None, spot_sharded_for=("cc_n18",),
        out_path: str | None = None, seg_gates: int | None = None,
        seg_k: int | None = None) -> dict:
    """tier: small (n<=20 + classical), segments (the 21..31 set),
    trajectory, all."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    rows = []
    for name, path in discover():
        if names is not None and name not in names:
            continue
        cd, mode, err = parse_one(path)
        if cd is None:
            rows.append({"circuit": name, "status": "PARSE_FAIL",
                         "error": err})
            continue
        n = cd["number_of_qubits"]
        pol = _policy(name, cd, mode)
        want = (tier == "all"
                or (tier == "small" and pol in ("e2e", "classical"))
                or (tier == "segments" and pol == "segments")
                or (tier == "trajectory" and pol == "trajectory"))
        if names is not None:
            want = name in names
        if not want:
            continue
        if max_n is not None and n > max_n:
            rows.append({"circuit": name, "n": n, "gates": len(cd["gates"]),
                         "mode": mode, "status": "skipped",
                         "reason": f"--max-n {max_n}"})
            continue
        row = verify_one(name, path, spot_sharded=name in spot_sharded_for,
                         seg_gates=seg_gates, seg_k=seg_k,
                         parsed=(cd, mode, err))
        rows.append(row)
        print(json.dumps(row), flush=True)
        if out_path:  # incremental: survive interruption
            with open(out_path, "w") as f:
                json.dump({"rows": rows}, f, indent=1)

    summary = {
        "corpus": CLUSTER, "total_files": len(discover()),
        "checked": len(rows),
        "verified": sum(str(r.get("status")).startswith("verified")
                        for r in rows),
        "failed": sum("FAIL" in str(r.get("status")) for r in rows),
        "skipped": sum(r.get("status") == "skipped" for r in rows),
        "rows": rows,
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "rows"}))
    return summary


def write_manifest(bench_local_path: str, out_path: str) -> dict:
    """Freeze the verified corpus matrix as a CI-asserted manifest.

    One row per circuit: the verification method, status and an error
    BOUND (observed max_amp_err rounded up a decade) — so a future
    importer/kernel change that silently breaks a verified circuit
    fails `tests/test_corpus_manifest.py` rather than only the offline
    bench.  Reference analogue: `verify_compute`
    (`qasm_assembler_standalone.py:716`) running on every execution.
    """
    d = json.load(open(bench_local_path))
    rows = d["qasmbench_corpus"]["rows"]
    man = {}
    for r in sorted(rows, key=lambda r: r["circuit"]):
        e = {"n": r.get("n"), "gates": r.get("gates"),
             "method": r.get("method"), "status": r.get("status")}
        err = r.get("max_amp_err",
                    r.get("max_amp_err_vs_exact_lightcone"))
        if isinstance(err, float):
            # Per-circuit bound: observed error rounded up a DECADE
            # (then one more for re-run seed slack), capped at TOL —
            # a kernel regression that degrades a 1e-14 circuit to
            # 1e-11 fails the guard even though 1e-11 < TOL.
            e["max_amp_err"] = err
            e["max_amp_err_bound"] = min(
                TOL, 10.0 ** (np.ceil(np.log10(max(err, 1e-17))) + 1))
        if r.get("status") == "skipped":
            e["reason"] = r.get("reason")
        man[r["circuit"]] = e
    out = {"tol": TOL, "circuits": man,
           # "verified_c64" (the n=33 spill/lightcone rows) counts as
           # verified — same convention as bench/corpus33.py.
           "verified": sum(str(v["status"]).startswith("verified")
                           for v in man.values()),
           "skipped": sum(v["status"] == "skipped" for v in man.values())}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"manifest: {out['verified']} verified / {out['skipped']} "
          f"skipped -> {out_path}")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="small",
                    choices=["small", "segments", "trajectory", "all"])
    ap.add_argument("--max-n", type=int, default=None)
    ap.add_argument("--names", default=None,
                    help="comma-separated circuit names (overrides tier)")
    ap.add_argument("--out", default=None, help="incremental JSON path")
    ap.add_argument("--update-bench-local", action="store_true")
    ap.add_argument("--seg-gates", type=int, default=None,
                    help="override segment size (default: size policy)")
    ap.add_argument("--seg-k", type=int, default=None,
                    help="override number of sampled segments")
    ap.add_argument("--write-manifest", action="store_true",
                    help="freeze BENCH_LOCAL qasmbench_corpus rows as "
                         "tests/data/corpus_manifest.json")
    a = ap.parse_args()
    if a.write_manifest:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        write_manifest(os.path.join(root, "BENCH_LOCAL.json"),
                       os.path.join(root, "tests", "data",
                                    "corpus_manifest.json"))
        return
    res = run(tier=a.tier, max_n=a.max_n,
              names=a.names.split(",") if a.names else None,
              out_path=a.out, seg_gates=a.seg_gates, seg_k=a.seg_k)
    if a.update_bench_local:
        p = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), "BENCH_LOCAL.json")
        d = json.load(open(p))
        cur = d.get("qasmbench_corpus", {"rows": []})
        by_name = {r["circuit"]: r for r in cur.get("rows", [])}
        for r in res["rows"]:
            by_name[r["circuit"]] = r
        merged = sorted(by_name.values(),
                        key=lambda r: (r.get("n", 0), r["circuit"]))
        d["qasmbench_corpus"] = {
            "corpus": res["corpus"], "total_files": res["total_files"],
            "verified": sum(str(r.get("status")).startswith("verified")
                            for r in merged),
            "failed": sum("FAIL" in str(r.get("status")) for r in merged),
            "skipped": sum(r.get("status") == "skipped" for r in merged),
            "tol": TOL, "rows": merged,
        }
        with open(p, "w") as f:
            json.dump(d, f, indent=1)
        print(f"BENCH_LOCAL.json updated: {d['qasmbench_corpus']['verified']}"
              f"/{len(merged)} verified")


if __name__ == "__main__":
    main()
