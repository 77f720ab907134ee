"""Circuit-dict contract: validation, name-encoded parsing, levelization.

The contract is shared with the reference framework
(``/root/reference/wenbo_engine/docs/circuit_contract.md``,
``wenbo_engine/circuit/io.py``):

.. code-block:: python

    {"number_of_qubits": int,
     "gates": [{"qubits": [int, ...], "gate": str, "params": {...}}, ...]}

* **Endianness: little-endian.** Qubit 0 is bit 0 (LSB) of the
  statevector index: |q_{n-1} ... q_1 q_0> has index
  q_0 + 2 q_1 + ... + 2^{n-1} q_{n-1}.
* Name-encoded params: ``"CR3"`` means CR with k=3, ``"R3"`` means R
  with k=3 (``RY`` is never name-decoded).
* ``validate_circuit_dict`` raises ``ValueError`` on any malformed
  input and returns a normalised deep copy.

Extended gates (RX/RZ/P/RZZ/CCX/...) are accepted by default; pass
``core_only=True`` to restrict validation to the reference's 15-gate
contract.
"""
from __future__ import annotations

import hashlib
import json
import re
from typing import Any

from . import gates as G

ENDIANNESS = "little"

_RE_CR = re.compile(r"^CR(\d+)$")
_RE_R = re.compile(r"^R(\d+)$")

_NUMERIC = (int, float)


def parse_name_encoded(raw: str) -> tuple[str, dict]:
    """``CR3`` -> ('CR', {'k': 3}); ``R3`` -> ('R', {'k': 3}); else (raw, {})."""
    m = _RE_CR.match(raw)
    if m:
        return "CR", {"k": int(m.group(1))}
    if raw not in ("RY", "RX", "RZ", "RXX", "RYY", "RZZ"):
        m = _RE_R.match(raw)
        if m:
            return "R", {"k": int(m.group(1))}
    return raw, {}


def validate_circuit_dict(d: dict[str, Any], *, core_only: bool = False) -> dict:
    """Validate and normalise a circuit dict.  Raises ValueError on bad input."""
    if not isinstance(d, dict):
        raise ValueError("circuit must be a dict")
    missing = {"number_of_qubits", "gates"} - set(d)
    if missing:
        raise ValueError(f"missing required keys: {missing}")
    extra = set(d) - {"number_of_qubits", "gates"}
    if extra:
        raise ValueError(f"unknown top-level keys: {extra}")

    n = d["number_of_qubits"]
    if not isinstance(n, int) or isinstance(n, bool) or n < 1:
        raise ValueError(f"number_of_qubits must be a positive int, got {n!r}")
    if not isinstance(d["gates"], list):
        raise ValueError("gates must be a list")

    return {
        "number_of_qubits": n,
        "gates": [_validate_gate(g, n, i, core_only) for i, g in enumerate(d["gates"])],
    }


def _validate_gate(g: Any, nq: int, idx: int, core_only: bool) -> dict:
    tag = f"gate[{idx}]"
    if not isinstance(g, dict):
        raise ValueError(f"{tag}: must be a dict")
    if not {"qubits", "gate"} <= set(g):
        raise ValueError(f"{tag}: missing 'qubits' or 'gate'")
    unknown = set(g) - {"qubits", "gate", "params"}
    if unknown:
        raise ValueError(f"{tag}: unknown keys {unknown}")

    qubits = g["qubits"]
    if not isinstance(qubits, list) or not all(
        isinstance(q, int) and not isinstance(q, bool) for q in qubits
    ):
        raise ValueError(f"{tag}: qubits must be list[int]")
    for q in qubits:
        if q < 0 or q >= nq:
            raise ValueError(f"{tag}: qubit {q} out of range [0, {nq})")
    if len(set(qubits)) != len(qubits):
        raise ValueError(f"{tag}: duplicate qubits {qubits}")

    if not isinstance(g["gate"], str):
        raise ValueError(f"{tag}: gate name must be a string")
    base, name_params = parse_name_encoded(g["gate"])
    allowed = G.CORE_GATES if core_only else G.ALL_GATES
    if base not in allowed:
        raise ValueError(f"{tag}: unsupported gate {g['gate']!r}")

    expected = G.arity(base)
    if len(qubits) != expected:
        raise ValueError(
            f"{tag}: {base} needs {expected} qubit(s), got {len(qubits)}"
        )

    merged = {**name_params, **(g.get("params") or {})}
    for key in G.PARAM_SPEC.get(base, ()):
        if key not in merged:
            raise ValueError(f"{tag}: {base} requires param {key!r}")
        val = merged[key]
        if key == "U":
            continue  # array-valued; checked by gate_matrix
        if key in ("k", "p", "exponent"):
            if not isinstance(val, int) or isinstance(val, bool):
                raise ValueError(f"{tag}: param {key!r} must be int")
        elif not isinstance(val, _NUMERIC) or isinstance(val, bool):
            raise ValueError(f"{tag}: param {key!r} must be numeric")

    return {"qubits": list(qubits), "gate": base, "params": merged}


# ---------------------------------------------------------------------------
# Levelization
# ---------------------------------------------------------------------------

def levelize(circuit_dict: dict) -> list[list[dict]]:
    """Group gates into dependency-free levels (ASAP scheduling).

    Two gates that share a qubit land in different levels; gate order
    within the original list is preserved inside each level.  Mirrors
    the reference semantics (``wenbo_engine/circuit/io.py:106-117``).
    """
    levels: list[list[dict]] = []
    qubit_free: dict[int, int] = {}
    for g in circuit_dict["gates"]:
        t = max((qubit_free.get(q, 0) for q in g["qubits"]), default=0)
        while len(levels) <= t:
            levels.append([])
        levels[t].append(g)
        for q in g["qubits"]:
            qubit_free[q] = t + 1
    return levels


def circuit_depth(circuit_dict: dict) -> int:
    return len(levelize(circuit_dict))


def circuit_hash(circuit_dict: dict) -> str:
    """Stable SHA-256 of a circuit dict (WAL identity, jit-cache key).

    Complex/array params (e.g. CU's U) are serialised via repr so the
    hash is deterministic for any contract-valid circuit.
    """
    blob = json.dumps(circuit_dict, sort_keys=True, default=repr)
    return hashlib.sha256(blob.encode()).hexdigest()


def gate_counts(circuit_dict: dict) -> dict[str, int]:
    counts: dict[str, int] = {}
    for g in circuit_dict["gates"]:
        counts[g["gate"]] = counts.get(g["gate"], 0) + 1
    return counts
