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


if __name__ == "__main__":
    print(json.dumps(run(), indent=1))
