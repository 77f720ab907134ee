"""Command-line interface.

    python -m quantum_simulations_tpu run circuit.json [--mode panel] ...
    python -m quantum_simulations_tpu sample circuit.json --shots 100
    python -m quantum_simulations_tpu stats circuit.json
    python -m quantum_simulations_tpu bench [kernel_bw|e2e|sweep|suite|spill_bw]

Circuit files are contract JSON dicts or OpenQASM 2.0 (.qasm).
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _load_circuit(path: str, trajectory: bool = False) -> dict:
    p = Path(path)
    if p.suffix == ".qasm":
        from .circuit.import_qasm import load_qasm

        return load_qasm(
            p, nonunitary="trajectory" if trajectory else "error")
    return json.loads(p.read_text())


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="quantum_simulations_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("circuit", help="circuit JSON or .qasm file")
    common.add_argument("--dtype", default="complex64")
    common.add_argument("--mode", default="panel",
                        choices=["panel", "fused", "window", "capacity",
                                 "auto"])
    common.add_argument("--devices", type=int, default=None)
    common.add_argument("--stripe-qubits", type=int, default=None)
    common.add_argument("--spill-backend", default="host",
                        choices=["host", "disk"])
    common.add_argument(
        "--sparse", nargs="?", const=True, default=False,
        choices=[True, "auto"], metavar="auto",
        help="sparse tier; '--sparse auto' switches to dense adaptively")
    common.add_argument("--no-fusion", action="store_true")
    common.add_argument("--staging", action="store_true")
    common.add_argument("--work-dir", default=None)
    common.add_argument("--segment-gates", type=int, default=None,
                        help="compile as locality-cut sub-programs of "
                             "<= N gates (bounds compile time)")
    common.add_argument("--checkpoint-every", type=int, default=1,
                        help="WAL runner: checkpoint cadence in steps")
    common.add_argument(
        "--trajectory", action="store_true",
        help="accept RESET / mid-circuit measure / if(creg==v) "
             "(QASM) and run one seeded trajectory")
    common.add_argument("--trajectory-seed", type=int, default=0,
                        help="seed for trajectory measurement draws")
    common.add_argument("--step-levels", type=int, default=None,
                        help="WAL runner: bound circuit levels per "
                             "durable step (real commit cadence for "
                             "deep all-local circuits)")

    p_run = sub.add_parser("run", parents=[common],
                           help="simulate; print state summary")
    p_run.add_argument("--top", type=int, default=8,
                       help="print the k largest amplitudes")

    p_sample = sub.add_parser("sample", parents=[common])
    p_sample.add_argument("--shots", type=int, default=100)
    p_sample.add_argument("--seed", type=int, default=0)

    sub.add_parser("stats", parents=[common],
                   help="compile statistics (fusion/staging/panel)")

    p_export = sub.add_parser(
        "export", parents=[common],
        help="serialise the circuit (qasm to stdout, dot for the DAG)")
    p_export.add_argument("--format", default="qasm",
                          choices=["qasm", "dot", "json"])
    p_export.add_argument("--partitions", type=int, default=None,
                          help="dot only: cluster by partition()")

    p_bench = sub.add_parser("bench")
    p_bench.add_argument("which", choices=[
        "kernel_bw", "e2e", "sweep", "suite", "spill_bw",
        "baseline_configs", "capacity", "matrix", "projection"])

    p_place = sub.add_parser(
        "placement",
        help="shard-placement report + invariant checks over the device "
             "mesh (distribution verifier)")
    p_place.add_argument("--devices", type=int, default=None)
    p_place.add_argument("--qubits", type=int, default=None)

    args = ap.parse_args(argv)

    if args.cmd == "placement":
        from .parallel.placement import main as placement_main

        rep = placement_main(n_devices=args.devices, n=args.qubits)
        print(json.dumps(rep, indent=1))
        return 0 if (rep["invariants"]["ok"]
                     and rep["sharded_array_check"]["ok"]) else 1

    if args.cmd == "bench":
        import importlib

        mod = importlib.import_module(f".bench.{args.which}", __package__)
        print(json.dumps(mod.run(), indent=1))
        return 0

    cd = _load_circuit(args.circuit,
                       trajectory=getattr(args, "trajectory", False))

    if args.cmd == "export":
        if args.format == "qasm":
            from .circuit.export_qasm import to_qasm

            sys.stdout.write(to_qasm(cd))
        elif args.format == "dot":
            from .circuit.dag import partition, to_dot

            parts = (partition(cd, args.partitions, "locality")
                     if args.partitions else None)
            sys.stdout.write(to_dot(cd, parts))
        else:
            print(json.dumps(cd, indent=1))
        return 0

    if args.cmd == "stats":
        from .circuit.contract import circuit_depth, gate_counts
        from .circuit.fusion import fusion_stats
        from .circuit.panelize import panel_stats

        n = cd["number_of_qubits"]
        out = {
            "n_qubits": n,
            "n_gates": len(cd["gates"]),
            "depth": circuit_depth(cd),
            "gate_counts": gate_counts(cd),
            "fusion": fusion_stats(cd, k=n),
            "panel": panel_stats(cd),
        }
        print(json.dumps(out, indent=1))
        return 0

    from .api import sample as api_sample
    from .api import simulate as api_simulate
    from .utils.config import SimulatorConfig

    cfg = SimulatorConfig(
        dtype=args.dtype, mode=args.mode, n_devices=args.devices,
        stripe_qubits=args.stripe_qubits, spill_backend=args.spill_backend,
        sparse=args.sparse, use_fusion=not args.no_fusion,
        use_staging=args.staging, segment_gates=args.segment_gates,
        checkpoint_every=args.checkpoint_every,
        max_levels_per_step=args.step_levels,
        trajectory_seed=args.trajectory_seed,
    )

    if args.cmd == "sample":
        bits = api_sample(cd, args.shots, seed=args.seed, config=cfg)
        for row in bits:
            print("".join(str(int(b)) for b in row[::-1]))  # q_{n-1}...q_0
        return 0

    result = api_simulate(cd, cfg, work_dir=args.work_dir)
    if hasattr(result, "summary"):  # capacity tier: planar readout
        print(json.dumps(result.summary(args.top), indent=1))
    elif hasattr(result, "top_amplitudes"):  # stayed sparse (incl. auto)
        print(json.dumps({
            "nonzero": len(result),
            "norm": result.norm(),
            "top": [[hex(i), [complex(a).real, complex(a).imag]]
                    for i, a in result.top_amplitudes(args.top)],
        }, indent=1))
    else:
        import numpy as np

        probs = np.abs(result) ** 2
        top = np.argsort(probs)[::-1][: args.top]
        print(json.dumps({
            "n_amplitudes": int(result.size),
            "norm2": float(probs.sum()),
            "top": [[hex(int(i)), float(probs[i])] for i in top],
        }, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
