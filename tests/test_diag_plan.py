"""Matmul-form diag plan (ops/diag_plan.py) + fused panel epilogue."""
import os

import numpy as np
import pytest

from quantum_simulations_tpu.circuit import library as lib
from quantum_simulations_tpu.circuit.panelize import diag_phase_terms
from quantum_simulations_tpu.ops.diag_plan import (
    MAX_COLS, eval_theta_np, plan_diag_matmul,
)
from quantum_simulations_tpu.oracle import dense_numpy as oracle
from quantum_simulations_tpu.runtime import simulator


def _theta_brute(terms, idx):
    th = np.zeros_like(idx, dtype=float)
    for qs, coeff in terms:
        t = np.full(idx.shape, float(coeff))
        for q in qs:
            t = t * ((idx >> q) & 1)
        th += t
    return th


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_plan_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    n = 15
    terms = {}
    for _ in range(12):
        k = int(rng.integers(1, 4))
        qs = tuple(sorted(rng.choice(n, size=k, replace=False).tolist()))
        dv = np.exp(1j * rng.uniform(-np.pi, np.pi, size=1 << len(qs)))
        for key, c in diag_phase_terms(qs, dv).items():
            key = tuple(sorted(key))
            terms[key] = terms.get(key, 0.0) + c
    terms_t = tuple(terms.items())

    # Geometry: rows = bits [7, 11), grid axis 0 = bits [11, n).
    rows = 16
    plan = plan_diag_matmul(
        terms_t,
        row_bit_of={q: q - 7 for q in range(7, 11)},
        grid_bit_of={q: (0, q - 11) for q in range(11, n)},
        n_rows=rows,
    )
    assert plan is not None
    A, M, s_spec = plan
    assert A.shape[1] == M.shape[0] == len(s_spec)
    assert A.shape[1] in (8, 16, 32, 64)

    idx = np.arange(1 << n)
    want = _theta_brute(terms_t, idx).reshape(-1, rows, 128)
    for blk in range(want.shape[0]):
        got = eval_theta_np(A, M, s_spec, (blk,))
        np.testing.assert_allclose(got, want[blk], atol=1e-12)


def test_column_overflow_returns_none():
    # Dynamic (grid-dependent) columns can't merge across distinct
    # (lane, row) keys: > MAX_COLS of them forces the fallback path.
    terms = tuple(((q, r, 20), 0.1)
                  for q in range(7) for r in range(7, 17))
    assert 7 * 10 > MAX_COLS
    plan = plan_diag_matmul(
        terms,
        row_bit_of={q: q - 7 for q in range(7, 17)},
        grid_bit_of={20: (0, 0)},
        n_rows=1 << 10,
    )
    assert plan is None


@pytest.mark.parametrize("fuse", ["1", "0"])
def test_window_mode_fusion_toggle(fuse, monkeypatch):
    monkeypatch.setenv("QST_PANEL_DIAG_FUSE", fuse)
    simulator._COMPILE_CACHE.clear()
    cd = lib.qft(14)
    got = np.asarray(simulator.simulate(cd, dtype="complex128",
                                        mode="window"))
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-10)
    simulator._COMPILE_CACHE.clear()


def test_pairing_compresses_qft_schedule():
    from quantum_simulations_tpu.circuit.panelize import (
        compile_window_schedule)
    from quantum_simulations_tpu.runtime.simulator import pair_panel_diag

    ops = compile_window_schedule(lib.qft(26), diag_terms_only=True)
    pairs = pair_panel_diag(ops, enabled=True)
    fused = sum(1 for _, t in pairs if t is not None)
    assert fused >= 3  # qft26: every merged diag rides a panel
    assert len(pairs) == len(ops) - fused
