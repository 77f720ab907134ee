"""Matmul-form planner for merged diagonal phase runs.

A merged diagonal run is a Möbius phase decomposition
``theta(idx) = sum coeff * prod(index bits)`` (``circuit/panelize.
diag_phase_terms``).  On a Pallas block whose flat index splits into
(row, lane) in-block coordinates plus per-grid-step bits, every term
is rank-1 over (row, lane):

    coeff * s_P(grid bits) * maskR(row) * maskL(lane)

so the WHOLE angle field factors as one tiny matmul

    theta(row, lane) = (A * S) @ M

with A a (rows, C) numpy-constant column stack of row masks / row
angles, M a (C, 128) constant of lane masks / lane angles, and S a
(1, C) vector of per-grid-step scalars (products of program-id bits;
1.0 for static columns).  The kernel then pays ONE cos/sin per element
regardless of term count — where the rotation-composition form paid
~6 flops per element per lane-subset group (measured VPU-bound at
317-345 GB/s on the qft26 merged runs vs the 650+ GB/s HBM ceiling).

Columns are merged by (lane-subset, row-subset) key so the column
count stays small (QFT-style CR ladders: ~10-30 columns), and padded
to a few fixed widths so Mosaic sees few distinct kernel shapes.

TPU analogue of the reference's fused diagonal entry tables
(``v3_hisvsim_spark/src/parallel_gate_applicator.py:128-232``).
"""
from __future__ import annotations

import numpy as np

# Pad column counts to these widths so kernel shapes stay few.
_COL_BUCKETS = (8, 16, 32, 64)
MAX_COLS = _COL_BUCKETS[-1]


def plan_diag_matmul(
    terms,
    row_bit_of: dict,
    grid_bit_of: dict,
    n_rows: int,
    lane_count: int = 128,
):
    """Build the (A, M, S-spec) factorization of a merged diagonal run.

    terms        iterable of (qubits-tuple, coeff) Möbius phase terms.
    row_bit_of   global state bit -> bit position of the flat in-block
                 row index (non-lane in-block axes, row-major).
    grid_bit_of  global state bit -> (grid_axis, shift): the bit is
                 ``(program_id(grid_axis) >> shift) & 1``.
    n_rows       flat row count of one block.
    lane_count   lane-axis width (128).

    Returns ``(A, M, s_spec)`` with A float32 (n_rows, C), M float32
    (C, lane_count), and s_spec a length-C tuple whose entries are
    ``None`` for static columns (S=1) or a tuple of
    ``(coeff, ((axis, shift), ...))`` products to sum at kernel time.
    Returns ``None`` if the factorization needs more than MAX_COLS
    columns (caller falls back to the composition kernel).
    """
    rr = np.arange(n_rows)[:, None]  # (rows, 1)
    ll = np.arange(lane_count)[None, :]  # (1, lanes)

    def mask_row(qs) -> np.ndarray:
        m = np.ones((n_rows, 1))
        for q in qs:
            m = m * ((rr >> row_bit_of[q]) & 1)
        return m[:, 0]

    def mask_lane(qs) -> np.ndarray:
        m = np.ones((1, lane_count))
        for q in qs:
            m = m * ((ll >> q) & 1)
        return m[0]

    # Split each term's qubits into lane / row / grid parts and bucket.
    static_row = np.zeros(n_rows)  # P=empty, L=empty -> one A column
    static_lane = np.zeros(lane_count)  # P=empty, R=empty, L!=empty
    has_static_row = False
    has_static_lane = False
    by_L: dict = {}  # P=empty, L and R nonempty: L -> A float column
    dyn: dict = {}  # P nonempty: (L, R) -> [(coeff, pdesc), ...]
    for qs, coeff in terms:
        coeff = float(coeff)
        if coeff == 0.0:
            continue
        L, R, P = [], [], []
        for q in qs:
            if q < 7:
                L.append(q)
            elif q in row_bit_of:
                R.append(q)
            else:
                P.append(grid_bit_of[q])
        L, R = tuple(sorted(L)), tuple(sorted(R))
        if P:
            dyn.setdefault((L, R), []).append((coeff, tuple(P)))
        elif not L:
            static_row += coeff * mask_row(R)
            has_static_row = True
        elif not R:
            static_lane += coeff * mask_lane(L)
            has_static_lane = True
        else:
            e = by_L.setdefault(L, np.zeros(n_rows))
            e += coeff * mask_row(R)

    cols_a, cols_m, s_spec = [], [], []
    if has_static_row:
        cols_a.append(static_row)
        cols_m.append(np.ones(lane_count))
        s_spec.append(None)
    if has_static_lane:
        cols_a.append(np.ones(n_rows))
        cols_m.append(static_lane)
        s_spec.append(None)
    for L, acol in by_L.items():
        cols_a.append(acol)
        cols_m.append(mask_lane(L))
        s_spec.append(None)
    for (L, R), prods in dyn.items():
        cols_a.append(mask_row(R) if R else np.ones(n_rows))
        cols_m.append(mask_lane(L) if L else np.ones(lane_count))
        s_spec.append(tuple(prods))

    C = len(cols_a)
    if C == 0:
        cols_a.append(np.zeros(n_rows))
        cols_m.append(np.zeros(lane_count))
        s_spec.append(None)
        C = 1
    if C > MAX_COLS:
        return None
    for b in _COL_BUCKETS:
        if C <= b:
            pad = b - C
            break
    for _ in range(pad):
        cols_a.append(np.zeros(n_rows))
        cols_m.append(np.zeros(lane_count))
        s_spec.append(None)

    # float64 here; the kernel wrapper casts to the plane dtype (an
    # f32 cast at plan time would poison the complex128 tier).
    A = np.stack(cols_a, axis=1)
    M = np.stack(cols_m, axis=0)
    return A, M, tuple(s_spec)


def eval_theta_np(A, M, s_spec, pids) -> np.ndarray:
    """Reference evaluation of theta for tests: (rows, lanes) array."""
    S = np.ones((1, A.shape[1]))
    for c, spec in enumerate(s_spec):
        if spec is None:
            continue
        s = 0.0
        for coeff, pbits in spec:
            t = coeff
            for axis, shift in pbits:
                t *= (pids[axis] >> shift) & 1
            s += t
        S[0, c] = s
    return (A * S) @ M
