"""In-memory numpy reference simulator — the correctness oracle.

complex128, little-endian, applies gates one-by-one to the full 2^n
statevector.  Practical to n ~ 24 on a host; everything downstream
(jnp engine, sharded engine, Pallas kernels, sparse and out-of-core
tiers) is tested against this module.

Role mirrors the reference's oracle (``wenbo_engine/kernel/ref_dense.py``);
the implementation is an independent little-endian bit-arithmetic
simulator supporting gates of any arity.
"""
from __future__ import annotations

import numpy as np

from ..circuit import gates as G
from ..circuit.contract import validate_circuit_dict


def apply_gate(psi: np.ndarray, qubits: list[int], U: np.ndarray) -> np.ndarray:
    """Apply an m-qubit unitary to ``psi`` (returns a new array).

    ``U`` is 2^m x 2^m in big-endian subspace order: subspace index
    bit (m-1-j) carries qubits[j] — i.e. qubits[0] is the MSB.
    """
    n_amps = psi.size
    m = len(qubits)
    dim = 1 << m
    if U.shape != (dim, dim):
        raise ValueError(f"matrix shape {U.shape} does not match {m} qubits")

    # Enumerate base indices: all amplitudes with every gate-qubit bit = 0.
    idx = np.arange(n_amps)
    mask = np.ones(n_amps, dtype=bool)
    for q in qubits:
        mask &= ((idx >> q) & 1) == 0
    base = idx[mask]

    # offsets[s] adds the gate-qubit bits for subspace index s.
    offsets = np.zeros(dim, dtype=np.int64)
    for s in range(dim):
        off = 0
        for j, q in enumerate(qubits):
            if (s >> (m - 1 - j)) & 1:
                off |= 1 << q
        offsets[s] = off

    gathered = np.stack([psi[base + offsets[s]] for s in range(dim)])  # (dim, M)
    result = U @ gathered
    out = psi.copy()
    for s in range(dim):
        out[base + offsets[s]] = result[s]
    return out


def zero_state(n: int, dtype=np.complex128) -> np.ndarray:
    psi = np.zeros(1 << n, dtype=dtype)
    psi[0] = 1.0
    return psi


def simulate(circuit_dict: dict, *, initial_state: np.ndarray | None = None) -> np.ndarray:
    """Run a circuit, return the final statevector (complex128)."""
    cd = validate_circuit_dict(circuit_dict)
    n = cd["number_of_qubits"]
    psi = zero_state(n) if initial_state is None else np.array(
        initial_state, dtype=np.complex128, copy=True
    )
    if psi.size != (1 << n):
        raise ValueError("initial_state size mismatch")
    for g in cd["gates"]:
        U = G.gate_matrix(g["gate"], g["params"])
        psi = apply_gate(psi, g["qubits"], U)
    return psi


def probabilities(psi: np.ndarray) -> np.ndarray:
    return (psi.real**2 + psi.imag**2).astype(np.float64)


def _p1(psi: np.ndarray, q: int) -> float:
    n = int(np.log2(psi.size))
    x = probabilities(psi).reshape(1 << (n - q - 1), 2, 1 << q)
    return float(x[:, 1, :].sum())


def _collapse(psi: np.ndarray, q: int, outcome: int,
              flip_to_zero: bool = False) -> np.ndarray:
    """Project qubit q onto |outcome>, renormalize; optionally map the
    kept plane back to |0> (RESET semantics)."""
    n = int(np.log2(psi.size))
    x = psi.reshape(1 << (n - q - 1), 2, 1 << q)
    keep = x[:, outcome, :]
    out = np.zeros_like(x)
    dest = 0 if flip_to_zero else outcome
    out[:, dest, :] = keep
    out = out.reshape(psi.size)
    nrm = np.sqrt(probabilities(out).sum())
    if nrm == 0.0:
        raise FloatingPointError(
            f"collapse of qubit {q} onto |{outcome}> has zero probability")
    return out / nrm


def simulate_trajectory(circuit_dict: dict, *, seed: int = 0,
                        initial_state: np.ndarray | None = None):
    """Oracle for the trajectory tier: RESET / MEASURE / conditional
    gates with seeded measurement outcomes.

    One uniform draw is consumed per RESET/MEASURE in gate order
    (outcome 1 iff ``u < P(1)``), so an engine sharing the seed and
    draw order follows the identical trajectory.  Returns
    ``(psi, cregs, outcomes)`` where ``cregs`` maps register name ->
    integer value and ``outcomes`` is the per-measurement bit list.

    Semantics the reference lacks: its QASM driver drops ``reset``
    (``qasm_assembler_standalone.py:525``) and cannot parse ``if``.
    """
    from ..circuit.contract import validate_circuit_dict as _v

    cd = _v(circuit_dict, allow_nonunitary=True)
    n = cd["number_of_qubits"]
    psi = zero_state(n) if initial_state is None else np.array(
        initial_state, dtype=np.complex128, copy=True)
    rng = np.random.default_rng(seed)
    cregs: dict[str, int] = {}
    outcomes: list[int] = []
    for g in cd["gates"]:
        name = g["gate"]
        if name in ("RESET", "MEASURE"):
            q = g["qubits"][0]
            u = float(rng.random())
            outcome = int(u < _p1(psi, q))
            outcomes.append(outcome)
            psi = _collapse(psi, q, outcome, flip_to_zero=(name == "RESET"))
            if name == "MEASURE":
                p = g["params"]
                val = cregs.get(p["creg"], 0)
                bit = 1 << p["cbit"]
                cregs[p["creg"]] = (val & ~bit) | (bit if outcome else 0)
            continue
        cond = g.get("cond")
        if cond is not None and cregs.get(cond["creg"], 0) != cond["value"]:
            continue
        U = G.gate_matrix(name, g["params"])
        psi = apply_gate(psi, g["qubits"], U)
    return psi, cregs, outcomes


def fidelity_overlap(a: np.ndarray, b: np.ndarray) -> float:
    """|<a|b>| — phase-invariant state comparison (dual-oracle metric)."""
    return float(abs(np.vdot(a, b)))
