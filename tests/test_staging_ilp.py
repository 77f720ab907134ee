"""Exercise staging's PuLP ILP branch without PuLP installed.

The image has no ``pulp``, so ``stage_circuit(..., method='ilp')``
normally falls back to the exact branch-and-bound (``ilp-bb``) — the
solver-facing construction (variables, constraints, the binary search
on stage count) never runs in CI.  Here a minimal exact 0/1 solver
implementing the tiny slice of the PuLP API staging uses
(``LpProblem/LpVariable/lpSum/value/LpStatus/PULP_CBC_CMD``) is
injected via ``sys.modules``, so the real ILP-construction code in
``circuit/staging.py:_stage_ilp`` executes end to end and must agree
with ilp-bb on small instances.  (Reference formulation:
``wenbo_engine/circuit/staging.py:243-315``.)
"""
import itertools
import sys
import types

import numpy as np
import pytest

from quantum_simulations_tpu.circuit import staging as S
from quantum_simulations_tpu.oracle import dense_numpy as oracle


# ---------------------------------------------------------------------------
# minimal exact PuLP stand-in (binary vars, linear constraints, feasibility)

class _Expr:
    def __init__(self, terms=None, const=0.0):
        self.terms = dict(terms or {})  # var -> coeff
        self.const = float(const)

    def _as_expr(self, other):
        if isinstance(other, _Expr):
            return other
        return _Expr(const=other)

    def __add__(self, other):
        o = self._as_expr(other)
        t = dict(self.terms)
        for v, c in o.terms.items():
            t[v] = t.get(v, 0.0) + c
        return _Expr(t, self.const + o.const)

    __radd__ = __add__

    def __sub__(self, other):
        return self + (self._as_expr(other) * -1.0)

    def __mul__(self, k):
        return _Expr({v: c * k for v, c in self.terms.items()},
                     self.const * k)

    __rmul__ = __mul__

    def __le__(self, other):
        return _Constraint(self - self._as_expr(other), "<=")

    def __ge__(self, other):
        return _Constraint(self._as_expr(other) - self, "<=")

    def __eq__(self, other):  # noqa: A003 - pulp semantics
        return _Constraint(self - self._as_expr(other), "==")

    def __hash__(self):
        return id(self)

    def value(self, assign):
        return self.const + sum(c * assign[v] for v, c in self.terms.items())


class _Var(_Expr):
    def __init__(self, name, cat):
        super().__init__()
        self.terms = {self: 1.0}
        self.name, self.cat = name, cat
        self.varValue = None


class _Constraint:
    def __init__(self, expr, op):
        self.expr, self.op = expr, op

    def ok(self, assign):
        v = self.expr.value(assign)
        return v <= 1e-9 if self.op == "<=" else abs(v) <= 1e-9


class _Problem:
    def __init__(self, name, sense):
        self.constraints = []

    def __iadd__(self, item):
        if isinstance(item, _Constraint):
            self.constraints.append(item)
        return self  # objectives (plain numbers/exprs) are ignored

    def solve(self, solver=None):
        vars_ = []
        seen = set()
        for c in self.constraints:
            for v in c.expr.terms:
                if id(v) not in seen:
                    seen.add(id(v))
                    vars_.append(v)
        if len(vars_) > 22:
            raise RuntimeError(f"fake solver: {len(vars_)} vars too many")
        # constraint -> var index list, for cheap evaluation
        for bits in itertools.product((0.0, 1.0), repeat=len(vars_)):
            assign = dict(zip(vars_, bits))
            if all(c.ok(assign) for c in self.constraints):
                for v, b in assign.items():
                    v.varValue = b
                return 1
        return 0


def _fake_pulp():
    m = types.ModuleType("pulp")
    m.LpProblem = _Problem
    m.LpMinimize = 1
    m.LpVariable = _Var
    m.lpSum = lambda it: sum(it, _Expr())
    m.value = lambda v: v.varValue
    m.LpStatus = {1: "Optimal", 0: "Infeasible"}
    m.PULP_CBC_CMD = lambda msg=0, timeLimit=None: None
    return m


@pytest.fixture
def with_fake_pulp(monkeypatch):
    monkeypatch.setitem(sys.modules, "pulp", _fake_pulp())


# ---------------------------------------------------------------------------

def _two_stage_instance():
    """4 qubits, k=2: H on every qubit — non-insular singles forcing
    two <=2-qubit stage sets (diagonal gates would be zero-stage)."""
    return {"number_of_qubits": 4, "gates": [
        {"qubits": [0], "gate": "H"},
        {"qubits": [1], "gate": "H"},
        {"qubits": [2], "gate": "H"},
        {"qubits": [3], "gate": "H"},
    ]}


def test_ilp_branch_runs_and_matches_bb(with_fake_pulp):
    cd = _two_stage_instance()
    out_cd, l2p, stats = S.stage_circuit(cd, 2, "ilp")
    assert stats["method"] == "ilp"  # the solver path, not ilp-bb
    # exact BB on the same instance for comparison
    sets = S._stage_bb(cd, 2)
    _, _, stats_bb = S._sets_to_schedule(cd, 2, sets)
    assert stats["stages"] == stats_bb["stages"] == 2


def test_ilp_schedule_is_correct(with_fake_pulp):
    """The ILP-produced schedule must still compute the right state."""
    cd = _two_stage_instance()
    out_cd, l2p, stats = S.stage_circuit(cd, 2, "ilp")
    got = S.permute_state(oracle.simulate(out_cd), l2p)
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-12)


def test_ilp_single_stage_instance(with_fake_pulp):
    cd = {"number_of_qubits": 3, "gates": [
        {"qubits": [0], "gate": "H"},
        {"qubits": [0, 1], "gate": "CNOT"},
    ]}
    _, _, stats = S.stage_circuit(cd, 2, "ilp")
    assert stats["method"] == "ilp"
    assert stats["stages"] == 1


def test_ilp_respects_gate_order(with_fake_pulp):
    """Order constraint: the shared-qubit SWAP chain pins stage order
    (each SWAP is non-insular on both qubits)."""
    cd = {"number_of_qubits": 4, "gates": [
        {"qubits": [0, 1], "gate": "SWAP"},
        {"qubits": [1, 2], "gate": "SWAP"},
        {"qubits": [2, 3], "gate": "SWAP"},
    ]}
    out_cd, l2p, stats = S.stage_circuit(cd, 2, "ilp")
    assert stats["method"] == "ilp"
    got = S.permute_state(oracle.simulate(out_cd), l2p)
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-12)


def test_without_pulp_falls_back_to_bb():
    """No pulp in this image: the documented ilp-bb fallback engages."""
    cd = _two_stage_instance()
    _, _, stats = S.stage_circuit(cd, 2, "ilp")
    assert stats["method"] in ("ilp-bb", "heuristic")
