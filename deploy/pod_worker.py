#!/usr/bin/env python3
"""Per-host entry point for multi-host (TPU pod) runs.

Run the SAME command on every host of the slice (the standard JAX
multi-controller pattern); the slice topology is autodetected from the
pod metadata, or set QST_COORDINATOR / QST_NUM_PROCESSES /
QST_PROCESS_ID explicitly for non-TPU clusters.

    python deploy/pod_worker.py circuit.json --devices 16 \
        [--work-dir /mnt/shared/run1] [--dtype complex64] [--shots 32]

TPU-native replacement for the reference's cluster runners
(``wenbo_engine/runner/spark_runner.py:67-136`` Spark task fan-out and
``v3_hisvsim_spark/hisvsim_repo/svsim-mpi.hpp:12-198`` MPI launch):
there is no external scheduler — every host runs this SPMD program and
XLA's collectives move amplitudes over ICI/DCN.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _load_circuit(path: str) -> dict:
    p = Path(path)
    if p.suffix == ".qasm":
        from quantum_simulations_tpu.circuit.import_qasm import load_qasm

        return load_qasm(p)
    return json.loads(p.read_text())


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("circuit", help="circuit JSON (or .qasm) path")
    ap.add_argument("--devices", type=int, default=None,
                    help="total mesh size (default: all pod devices)")
    ap.add_argument("--dtype", default="complex64")
    ap.add_argument("--work-dir", default=None,
                    help="shared dir for WAL + checkpoints (durability)")
    ap.add_argument("--shots", type=int, default=0,
                    help="sample bitstrings after the run (fully SPMD)")
    args = ap.parse_args()

    from quantum_simulations_tpu.parallel.distributed import (
        init_distributed, make_pod_mesh,
    )

    multihost = init_distributed()

    import jax
    import jax.numpy as jnp

    from quantum_simulations_tpu.parallel import executor as E

    cd = _load_circuit(args.circuit)
    mesh = make_pod_mesh(args.devices)
    out = {
        "process": jax.process_index(),
        "processes": jax.process_count(),
        "multihost": multihost,
        "mesh_devices": int(mesh.devices.size),
    }

    if args.work_dir:
        # Durable tier: WAL + checkpoints on the shared work dir;
        # every process must see the same filesystem.
        from quantum_simulations_tpu.runtime.runner import run as run_wal

        run_wal(cd, args.work_dir, mesh=mesh, dtype=args.dtype,
                use_fencing=False)
        out["work_dir"] = str(args.work_dir)
    else:
        psi = E.simulate_sharded(mesh, cd, dtype=args.dtype)
        out["norm2"] = float(jnp.sum(jnp.abs(psi) ** 2))
        if args.shots:
            from quantum_simulations_tpu.ops.sampling import (
                sample_bits_sharded,
            )

            bits = sample_bits_sharded(
                psi, jax.random.PRNGKey(0), args.shots,
                cd["number_of_qubits"], mesh)
            out["samples"] = np.asarray(jax.device_get(bits))[:8].tolist()

    if jax.process_index() == 0:
        print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
