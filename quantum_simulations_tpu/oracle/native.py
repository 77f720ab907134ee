"""Fast native-CPU simulator: the large-n oracle / CPU performance tier.

Same semantics as :mod:`oracle.dense_numpy` but runs on the C++/OpenMP
kernels (``native/host_engine.cpp``), in-place on one buffer — practical
to n ~ 32 in complex64 on a large host.  Fills the role of the
reference's in-RAM C++ engine (hisvsim) for verification and CPU runs.

Diagonal gates use the fused diag kernel; everything else uses the
strided pair/quad kernels.  Gates of arity >= 3 fall back to numpy.
"""
from __future__ import annotations

import numpy as np

from ..circuit import gates as G
from ..circuit.contract import validate_circuit_dict
from .. import native
from . import dense_numpy


def available() -> bool:
    return native.available()


def simulate(
    circuit_dict: dict,
    *,
    dtype=np.complex128,
    initial_state: np.ndarray | None = None,
) -> np.ndarray:
    """Run a circuit on the native CPU engine; returns the final state."""
    if not native.available():
        raise RuntimeError("native engine unavailable")
    cd = validate_circuit_dict(circuit_dict)
    n = cd["number_of_qubits"]
    if initial_state is None:
        psi = np.zeros(1 << n, dtype=dtype)
        psi[0] = 1.0
    else:
        psi = np.array(initial_state, dtype=dtype, copy=True)

    for g in cd["gates"]:
        U = G.gate_matrix(g["gate"], g["params"])
        qs = g["qubits"]
        if G.is_diagonal(U):
            native.apply_diag(psi, qs, np.diag(U))
        elif len(qs) == 1:
            native.apply_1q(psi, qs[0], U)
        elif len(qs) == 2:
            native.apply_2q(psi, qs[0], qs[1], U)
        else:
            psi = dense_numpy.apply_gate(psi, qs, U).astype(dtype)
    return psi
