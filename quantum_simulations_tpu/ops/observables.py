"""Pauli-string observables on statevectors.

The reference exposes Z-basis measurement primitives
(``hisvsim_repo/state_vector.hpp:829-897`` probability/project); the
workloads the library ships (VQE ansatz energies, QAOA MaxCut cost)
need general Pauli expectations.  A Pauli string P = P_{n-1}...P_0
(P_q in {I, X, Y, Z}) is evaluated by rotating each non-Z axis into Z
with a basis-change layer — H for X, (S^dagger then H) for Y — and
taking the Z-string expectation on the rotated state:

    <psi| P |psi> = <psi'| Z-string |psi'>,  psi' = B |psi>

so the hot path stays the same fused elementwise kernels and no 2^n
dense operator is ever built.  Hamiltonians are lists of
(coefficient, string) terms; each distinct basis layer is applied once
per term (callers batching many terms should group by basis).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..circuit import gates as G
from . import dense, sampling


def _basis_change(psi: jax.Array, pauli: dict[int, str]) -> jax.Array:
    """Rotate each X/Y axis in ``pauli`` into the Z basis."""
    H = G.H()
    HSdg = G.H() @ G.SDG()
    for q, p in pauli.items():
        if p == "X":
            psi = dense.apply_gate(psi, [q], H)
        elif p == "Y":
            psi = dense.apply_gate(psi, [q], HSdg)
    return psi


def _parse_string(pauli: str | dict[int, str]) -> dict[int, str]:
    """Accept 'XZIY...' (q0 leftmost? NO — qubit q = index q) or {q: P}.

    String form: character i names the Pauli on qubit i (little-endian,
    matching the contract's qubit order); 'I' entries are dropped.
    """
    if isinstance(pauli, str):
        out = {q: p.upper() for q, p in enumerate(pauli) if p.upper() != "I"}
    else:
        out = {int(q): p.upper() for q, p in pauli.items() if p.upper() != "I"}
    bad = sorted(set(out.values()) - {"X", "Y", "Z"})
    if bad:
        raise ValueError(f"unknown Pauli letters {bad}")
    return out


parse_pauli = _parse_string  # public name (api.expectation_pauli routing)


def expectation_pauli(psi: jax.Array, pauli: str | dict[int, str]) -> jax.Array:
    """<psi| P |psi> for one Pauli string (real scalar)."""
    ps = _parse_string(pauli)
    if not ps:
        return sampling.norm(psi) ** 2
    rotated = _basis_change(psi, ps)
    return sampling.expectation_z(rotated, sorted(ps))


def expectation_sum(psi: jax.Array,
                    terms: list[tuple[float, str | dict[int, str]]]) -> jax.Array:
    """Expectation of a Hamiltonian given as (coeff, pauli-string) terms."""
    total = jnp.zeros((), dtype=jnp.float32)
    for coeff, pauli in terms:
        total = total + coeff * expectation_pauli(psi, pauli)
    return total


def maxcut_energy(psi: jax.Array, edges: list[tuple[int, int]],
                  weights: list[float] | None = None) -> jax.Array:
    """QAOA MaxCut objective  sum_e w_e (1 - <Z_i Z_j>) / 2."""
    w = weights or [1.0] * len(edges)
    total = jnp.zeros((), dtype=jnp.float32)
    for (i, j), wij in zip(edges, w):
        zz = sampling.expectation_z(psi, [i, j])
        total = total + 0.5 * wij * (1.0 - zz)
    return total
