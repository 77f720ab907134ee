"""Step compiler: levelization -> fused execution steps.

Capability parity with the reference's fusion tier
(``wenbo_engine/circuit/fusion.py``): consecutive all-local levels are
batched into one pass and runs of 1Q gates on the same qubit are
pre-multiplied into a single 2x2 matrix.  On TPU a "pass" is one
traced/jitted device program over the sharded state instead of one
disk read-write cycle, but the economics are identical: maximize math
per HBM sweep.

TPU-specific addition — **low-panel packing**: runs of gates whose
qubits all sit below ``panel_width`` (<= 7) index bits are composed
into a single 2^w x 2^w unitary applied as ONE MXU matmul over the
whole shard (see ``ops/dense.py::apply_low_panel``).  This subsumes
the reference's gather->GEMM->scatter batched kernel and is the reason
the qubit-reordering scheduler tries to keep hot qubits low.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import gates as G
from .contract import levelize, validate_circuit_dict


@dataclass(frozen=True)
class GateOp:
    """A gate bound to its unitary. U: complex128, big-endian subspace."""
    qubits: tuple[int, ...]
    U: np.ndarray
    name: str = "?"

    @property
    def arity(self) -> int:
        return len(self.qubits)


@dataclass(frozen=True)
class LowPanelOp:
    """A fused unitary over the low `width` index bits (one MXU matmul)."""
    width: int
    W: np.ndarray  # (2^width, 2^width) complex128, little-endian over bits 0..w-1
    n_fused: int = 1

    @property
    def qubits(self) -> tuple[int, ...]:
        return tuple(range(self.width))


@dataclass
class Step:
    """One execution step: all local ops then all non-local ops.

    ``local_ops`` entries are GateOp or LowPanelOp; ``nonlocal_ops`` are
    GateOp touching at least one qubit >= k (the shard width).
    """
    local_ops: list = field(default_factory=list)
    nonlocal_ops: list = field(default_factory=list)
    level_indices: list = field(default_factory=list)


def compile_gate(g: dict) -> GateOp:
    return GateOp(
        qubits=tuple(g["qubits"]),
        U=G.gate_matrix(g["gate"], g.get("params") or {}),
        name=g["gate"],
    )


def _split_local(level_gates: list[dict], k: int) -> tuple[list[GateOp], list[GateOp]]:
    local: list[GateOp] = []
    nonloc: list[GateOp] = []
    for g in level_gates:
        op = compile_gate(g)
        (local if all(q < k for q in op.qubits) else nonloc).append(op)
    return local, nonloc


# ---------------------------------------------------------------------------
# 1Q fusion
# ---------------------------------------------------------------------------

def fuse_1q_ops(ops: list[GateOp]) -> list[GateOp]:
    """Fuse consecutive 1Q gates on the same qubit into one 2x2 matrix.

    Multi-qubit gates flush pending fusions on their qubits first, so
    application order is preserved exactly.
    """
    if not ops:
        return ops
    pending: dict[int, np.ndarray] = {}
    out: list[GateOp] = []

    def flush(q: int) -> None:
        U = pending.pop(q, None)
        if U is not None:
            out.append(GateOp(qubits=(q,), U=U, name="fused1q"))

    for op in ops:
        if op.arity == 1:
            q = op.qubits[0]
            pending[q] = op.U @ pending[q] if q in pending else op.U.copy()
        else:
            for q in op.qubits:
                flush(q)
            out.append(op)
    for q in sorted(pending):
        flush(q)
    return out


# ---------------------------------------------------------------------------
# Low-panel packing
# ---------------------------------------------------------------------------

def pack_low_panels(
    ops: list, panel_width: int, min_fuse: int = 2,
) -> list:
    """Greedily fuse consecutive ops with all qubits < panel_width.

    A run of >= min_fuse such gates becomes one LowPanelOp (single MXU
    matmul); shorter runs stay as individual elementwise passes (a
    matmul pass is only a win once it replaces several passes).
    """
    from ..ops.dense import compose_low_panel  # local import: avoid cycle

    out: list = []
    run: list[GateOp] = []

    def flush() -> None:
        nonlocal run
        if len(run) >= min_fuse:
            W = compose_low_panel([(op.qubits, op.U) for op in run], panel_width)
            out.append(LowPanelOp(width=panel_width, W=W, n_fused=len(run)))
        else:
            out.extend(run)
        run = []

    for op in ops:
        if isinstance(op, GateOp) and all(q < panel_width for q in op.qubits):
            run.append(op)
        else:
            flush()
            out.append(op)
    flush()
    return out


# ---------------------------------------------------------------------------
# Level batching -> steps
# ---------------------------------------------------------------------------

def batch_levels(levels: list[list[dict]], k: int) -> list[Step]:
    """Batch consecutive all-local levels into fused steps.

    A step containing non-local gates is always a single original
    level; consecutive all-local levels accumulate into one step whose
    local ops are 1Q-fused.
    """
    steps: list[Step] = []
    pending: list[GateOp] = []
    pending_idx: list[int] = []

    def flush_pending() -> None:
        nonlocal pending, pending_idx
        if pending:
            steps.append(Step(
                local_ops=fuse_1q_ops(pending),
                nonlocal_ops=[],
                level_indices=list(pending_idx),
            ))
            pending, pending_idx = [], []

    for lv_idx, level_gates in enumerate(levels):
        if not level_gates:
            continue
        local, nonloc = _split_local(level_gates, k)
        if nonloc:
            flush_pending()
            steps.append(Step(
                local_ops=local,
                nonlocal_ops=nonloc,
                level_indices=[lv_idx],
            ))
        else:
            pending.extend(local)
            pending_idx.append(lv_idx)
    flush_pending()
    return steps


def compile_steps(
    circuit_dict: dict,
    k: int,
    *,
    use_fusion: bool = True,
    panel_width: int | None = None,
    panel_min_fuse: int = 2,
) -> list[Step]:
    """Full pipeline: validate -> levelize -> batch/fuse -> low-panel pack."""
    circuit_dict = validate_circuit_dict(circuit_dict)
    levels = levelize(circuit_dict)
    if use_fusion:
        steps = batch_levels(levels, k)
    else:
        steps = []
        for lv_idx, level_gates in enumerate(levels):
            if not level_gates:
                continue
            local, nonloc = _split_local(level_gates, k)
            steps.append(Step(local_ops=local, nonlocal_ops=nonloc,
                              level_indices=[lv_idx]))
    if panel_width:
        width = min(panel_width, k)
        if width >= 1:
            for step in steps:
                step.local_ops = pack_low_panels(
                    step.local_ops, width, panel_min_fuse
                )
    return steps


def fusion_stats(circuit_dict: dict, k: int, panel_width: int | None = None) -> dict:
    """I/O-pass reduction statistics (benchmark aid, reference parity)."""
    circuit_dict = validate_circuit_dict(circuit_dict)
    levels = levelize(circuit_dict)
    steps = compile_steps(circuit_dict, k, use_fusion=True, panel_width=panel_width)
    n_levels = sum(1 for lv in levels if lv)
    n_steps = len(steps)
    ops_before = sum(len(lv) for lv in levels)
    ops_after = sum(len(s.local_ops) + len(s.nonlocal_ops) for s in steps)
    return {
        "original_levels": n_levels,
        "fused_steps": n_steps,
        "local_only_steps": sum(1 for s in steps if not s.nonlocal_ops),
        "io_reduction": f"{n_levels}->{n_steps} "
                        f"({(1 - n_steps / max(n_levels, 1)) * 100:.0f}% fewer)",
        "ops_before": ops_before,
        "ops_after": ops_after,
    }
