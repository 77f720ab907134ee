"""Trajectory tier: circuits with RESET / mid-circuit MEASURE /
classically-conditioned gates.

A statevector cannot represent the post-measurement *mixture*, so the
tier simulates one seeded **trajectory**: the circuit is segmented at
non-unitary instructions, each maximal unitary run compiles into one
XLA program through the fused dense engine
(:func:`runtime.simulator.build_circuit_fn`), and at each boundary the
host reads ONE probability scalar, draws the outcome from a seeded
``numpy`` Generator (outcome 1 iff ``u < P(1)``), and applies a jitted
collapse.  Classical conditions are resolved host-side when the
following segment is built — no data-dependent control flow ever
enters a traced program, so every segment is a static-shape XLA
program like any other tier.

The oracle twin is :func:`oracle.dense_numpy.simulate_trajectory`; the
two consume identical uniform draws in identical order, so a shared
seed pins the whole trajectory and final states match at tolerance.

Reference comparison: the reference's QASM driver *drops* ``reset``
with a printed warning (``hisvsim_repo/qasm_assembler_standalone.py:525``)
and cannot parse ``if(...)`` statements at all (``cc_n28`` is
unrunnable there).  This tier runs both with exact semantics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..circuit.contract import validate_circuit_dict
from ..ops import dense

_JIT_CACHE: dict = {}


def _p1_fn(n: int, q: int):
    """Jitted P(qubit q = 1) on a 2^n state; cached per (n, q)."""
    key = ("p1", n, q)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        def p1(psi):
            x = jnp.real(psi) ** 2 + jnp.imag(psi) ** 2
            x = x.reshape(1 << (n - q - 1), 2, 1 << q)
            return jnp.sum(x[:, 1, :], dtype=jnp.float32)
        fn = jax.jit(p1)
        _JIT_CACHE[key] = fn
    return fn


def _collapse_fn(n: int, q: int, outcome: int, flip_to_zero: bool):
    """Jitted project-and-renormalize; cached per (n, q, outcome, flip).

    ``flip_to_zero`` moves the kept plane to the |0> slot (RESET).
    The donated input lets XLA reuse the state buffer.
    """
    key = ("collapse", n, q, outcome, flip_to_zero)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        def collapse(psi):
            x = psi.reshape(1 << (n - q - 1), 2, 1 << q)
            keep = x[:, outcome, :]
            zero = jnp.zeros_like(keep)
            dest = 0 if flip_to_zero else outcome
            pair = (keep, zero) if dest == 0 else (zero, keep)
            out = jnp.stack(pair, axis=1).reshape(psi.size)
            nrm2 = jnp.sum(jnp.real(out) ** 2 + jnp.imag(out) ** 2)
            return out * jax.lax.rsqrt(nrm2).astype(out.dtype)
        fn = jax.jit(collapse, donate_argnums=(0,))
        _JIT_CACHE[key] = fn
    return fn


def split_segments(gates: list[dict]):
    """Split a gate list at non-unitary instructions.

    Yields ``(unitary_run, boundary)`` pairs where ``boundary`` is the
    RESET/MEASURE dict that follows the run (``None`` after the last
    run).  Gates keep their ``cond`` annotations — the caller resolves
    them against the classical registers *at build time*.
    """
    run: list[dict] = []
    out = []
    for g in gates:
        if g["gate"] in ("RESET", "MEASURE"):
            out.append((run, g))
            run = []
        else:
            run.append(g)
    out.append((run, None))
    return out


def simulate_trajectory(
    circuit_dict: dict,
    *,
    seed: int = 0,
    dtype=jnp.complex64,
    use_fusion: bool = True,
    panel_width: int | None = 7,
    initial_state=None,
):
    """Run one seeded trajectory; returns ``(psi, cregs, outcomes)``.

    ``psi`` is the final on-device statevector, ``cregs`` the classical
    register values, ``outcomes`` the per-measurement bits in circuit
    order.  Deterministic given ``seed`` (and exactly reproducible by
    the numpy oracle with the same seed).
    """
    from .simulator import build_circuit_fn

    cd = validate_circuit_dict(circuit_dict, allow_nonunitary=True)
    n = cd["number_of_qubits"]
    if initial_state is None:
        psi = dense.zero_state(n, dtype=dtype)
    else:
        psi = jnp.asarray(initial_state, dtype=dtype)
    rng = np.random.default_rng(seed)
    cregs: dict[str, int] = {}
    outcomes: list[int] = []

    for run, boundary in split_segments(cd["gates"]):
        live = []
        for g in run:
            cond = g.get("cond")
            if cond is not None and cregs.get(cond["creg"], 0) != cond["value"]:
                continue
            live.append({k: v for k, v in g.items() if k != "cond"})
        if live:
            fn = build_circuit_fn(
                {"number_of_qubits": n, "gates": live},
                dtype=dtype, use_fusion=use_fusion,
                panel_width=panel_width, donate=True,
            )
            psi = fn(psi)
        if boundary is None:
            continue
        q = boundary["qubits"][0]
        p1 = float(jax.device_get(_p1_fn(n, q)(psi)))
        u = float(rng.random())
        outcome = int(u < p1)
        outcomes.append(outcome)
        psi = _collapse_fn(
            n, q, outcome, boundary["gate"] == "RESET")(psi)
        if boundary["gate"] == "MEASURE":
            p = boundary["params"]
            val = cregs.get(p["creg"], 0)
            bit = 1 << p["cbit"]
            cregs[p["creg"]] = (val & ~bit) | (bit if outcome else 0)
    return psi, cregs, outcomes
