"""Adaptive sparse -> dense tier switching.

The reference's v3 profiles intermediate sparsity to understand when a
sparse representation stops paying off
(``v3_hisvsim_spark/tests/test_intermediate_sparsity.py``); this module
closes the loop: a circuit starts on the COO sparse engine and, the
moment the live nonzero count crosses a density threshold, the COO
state is scattered into a dense vector and the REMAINING gates run on
the dense JAX tier (which is orders of magnitude faster per gate once
the state is dense).

The switch rule is work-based: sparse gate cost is O(nnz), dense gate
cost is O(2^n); once nnz is a meaningful fraction of 2^n the dense
engine's constant factor (vectorised planes, fused passes) wins.  GHZ /
W-class circuits never switch (nnz stays O(1)/O(n)); H-wall or QFT-like
circuits switch within the first few gates.
"""
from __future__ import annotations

import numpy as np

from ..circuit import gates as G
from ..circuit.contract import validate_circuit_dict
from .engine import (
    DEFAULT_THRESHOLD,
    NUMPY_MAX_QUBITS,
    SparseState,
    _apply_gate_coo,
)

# Switch when nnz > DENSITY_SWITCH * 2^n (and dense fits memory).
DENSITY_SWITCH = 1.0 / 16.0
DENSE_MAX_QUBITS = 26


class AdaptiveResult:
    """Outcome of an adaptive run.

    ``state`` is a dense ``np.ndarray`` if the run switched (or a
    :class:`SparseState` if it stayed sparse to the end);
    ``switched_at`` is the gate index at which the dense tier took
    over (``None`` = never); ``nnz_history`` is the intermediate
    sparsity profile up to the switch point.
    """

    def __init__(self, state, switched_at, nnz_history):
        self.state = state
        self.switched_at = switched_at
        self.nnz_history = nnz_history

    @property
    def is_dense(self) -> bool:
        return isinstance(self.state, np.ndarray)

    def to_dense(self) -> np.ndarray:
        if self.is_dense:
            return self.state
        return self.state.to_dense()


def simulate_adaptive(
    circuit_dict: dict,
    *,
    threshold: float = DEFAULT_THRESHOLD,
    density_switch: float = DENSITY_SWITCH,
    dense_max_qubits: int = DENSE_MAX_QUBITS,
    dtype: str = "complex64",
    mode: str = "fused",
) -> AdaptiveResult:
    """Run sparsely until the state densifies, then switch tiers."""
    cd = validate_circuit_dict(circuit_dict)
    n = cd["number_of_qubits"]
    gates = cd["gates"]
    can_switch = n <= min(dense_max_qubits, NUMPY_MAX_QUBITS)
    nnz_limit = int(density_switch * (1 << n)) if can_switch else None

    if n > NUMPY_MAX_QUBITS:
        # bigint tier, no dense escape hatch at this n
        from .engine import simulate_sparse

        hist: list = []
        st = simulate_sparse(cd, threshold=threshold, nnz_history=hist)
        return AdaptiveResult(st, None, hist)

    idx = np.zeros(1, dtype=np.int64)
    amp = np.ones(1, dtype=np.complex128)
    hist = []
    for gi, g in enumerate(gates):
        U = G.gate_matrix(g["gate"], g["params"])
        idx, amp = _apply_gate_coo(idx, amp, g["qubits"], U, threshold)
        hist.append(len(idx))
        if nnz_limit is not None and len(idx) > nnz_limit:
            psi = np.zeros(1 << n, dtype=np.complex128)
            psi[idx] = amp
            rest = gates[gi + 1:]
            if rest:
                from ..runtime import simulator

                rest_cd = {"number_of_qubits": n, "gates": rest}
                psi = np.asarray(simulator.simulate(
                    rest_cd, dtype=dtype, mode=mode,
                    initial_state=psi.astype(
                        np.complex64 if dtype == "complex64"
                        else np.complex128),
                ))
            return AdaptiveResult(psi, gi + 1, hist)

    return AdaptiveResult(
        SparseState(n, dict(zip((int(i) for i in idx), amp))), None, hist)
