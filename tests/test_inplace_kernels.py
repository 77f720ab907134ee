"""In-place (input_output_aliases) kernel variants + planar-io window fn.

The n>=29 capacity tier runs every hot op with aliased in/out planes so
the 8 GiB planar state never needs a second HBM copy (a 16 GiB chip
cannot hold 2x).  These tests pin that the aliased variants are
bit-identical to the out-of-place ones and that the planar-io window
program matches the oracle.  TPU analogue of the reference's n=30
out-of-core ceiling (``wenbo_engine/docs/v3_comparison.md:45-62``).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantum_simulations_tpu.circuit import gates as G
from quantum_simulations_tpu.circuit import library as lib
from quantum_simulations_tpu.ops import dense
from quantum_simulations_tpu.ops import pallas_kernels as pk
from quantum_simulations_tpu.oracle import dense_numpy as oracle


def _planes(n, seed=0):
    rng = np.random.default_rng(seed)
    re = rng.normal(size=1 << n).astype(np.float32)
    im = rng.normal(size=1 << n).astype(np.float32)
    return jnp.asarray(re), jnp.asarray(im)


def _rand_u(dim, seed):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(dim, dim)) + 1j * rng.normal(size=(dim, dim))
    q, _ = np.linalg.qr(a)
    return q


class TestInplaceParity:
    def test_lane_panel(self):
        re, im = _planes(16, 1)
        W = _rand_u(128, 2)
        a = pk.panel_apply_planar(re, im, W, interpret=True)
        b = pk.panel_apply_planar(re, im, W, interpret=True, inplace=True)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))

    def test_wide_lane_panel(self):
        re, im = _planes(14, 3)
        W = dense.expand_to_low_block((3, 8), _rand_u(4, 4), 9)
        a = pk.panel_apply_planar(re, im, W, interpret=True)
        b = pk.panel_apply_planar(re, im, W, interpret=True, inplace=True)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))

    def test_positioned_panel(self):
        re, im = _planes(17, 5)
        W = _rand_u(8, 6)  # 3-qubit window at pos 8
        a = pk.positioned_panel_planar(re, im, W, 8, interpret=True)
        b = pk.positioned_panel_planar(
            re, im, W, 8, interpret=True, inplace=True)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))

    @pytest.mark.parametrize("qa,qb", [(10, 15), (15, 10), (11, 15)])
    def test_pair_inplace_row_path(self, qa, qb):
        re, im = _planes(17, 7)
        U = _rand_u(4, 8)
        a = pk.pair_update_planar(re, im, qa, qb, U, interpret=True)
        b = pk.pair_update_planar(
            re, im, qa, qb, U, interpret=True, inplace=True)
        np.testing.assert_allclose(
            np.asarray(a[0]), np.asarray(b[0]), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(a[1]), np.asarray(b[1]), atol=1e-6)

    def test_pair_inplace_rejects_col_range(self):
        """lo <= 9 pairs must not claim in-place support (the column
        view retiles; capacity mode routes them to midpair/planar)."""
        re, im = _planes(17, 7)
        with pytest.raises(AssertionError):
            pk.pair_update_planar(
                re, im, 8, 15, _rand_u(4, 8), interpret=True, inplace=True)

    @pytest.mark.parametrize("qa,qb", [(13, 16), (16, 13), (14, 15)])
    def test_pair_row_inplace_variant(self, qa, qb):
        re, im = _planes(18, 9)
        U = _rand_u(4, 10)
        a = pk.pair_update_planar(re, im, qa, qb, U, interpret=True)
        b = pk.pair_update_planar(
            re, im, qa, qb, U, interpret=True, inplace=True)
        np.testing.assert_allclose(
            np.asarray(a[0]), np.asarray(b[0]), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(a[1]), np.asarray(b[1]), atol=1e-6)

    @pytest.mark.parametrize("qa,qb", [(3, 12), (12, 3)])
    def test_mixed_pair(self, qa, qb):
        re, im = _planes(14, 11)
        U = _rand_u(4, 12)
        a = pk.mixed_pair_planar(re, im, qa, qb, U, interpret=True)
        b = pk.mixed_pair_planar(
            re, im, qa, qb, U, interpret=True, inplace=True)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


class TestWideLaneStraddler:
    """(lane, 7..9) 2q gates via the wide pos-0 panel dispatch."""

    @pytest.mark.parametrize("qa,qb", [(6, 7), (5, 8), (0, 9), (9, 2)])
    def test_matches_oracle(self, qa, qb):
        from quantum_simulations_tpu.runtime import simulator

        n = 11
        cd = {"number_of_qubits": n, "gates": [
            {"gate": "H", "qubits": [q], "params": {}} for q in range(n)
        ] + [
            {"gate": "T", "qubits": [qa], "params": {}},
            {"gate": "CNOT", "qubits": [qa, qb], "params": {}},
            {"gate": "SWAP", "qubits": [qa, qb], "params": {}},
            {"gate": "CY", "qubits": [qb, qa], "params": {}},
        ]}
        want = oracle.simulate(cd)
        got = np.asarray(simulator.simulate(
            cd, dtype="complex128", mode="window"))
        np.testing.assert_allclose(got, want, atol=1e-10)


class TestPlanarIoWindowFn:
    @pytest.mark.parametrize("fam,n", [("ghz", 12), ("qft", 10),
                                       ("non_stabilizer", 12)])
    def test_matches_oracle_inplace(self, fam, n):
        from quantum_simulations_tpu.runtime import simulator

        cd = getattr(lib, fam)(n)
        want = oracle.simulate(cd)
        fn = simulator.build_window_circuit_fn(
            cd, dtype=jnp.complex64, planar_io=True, inplace=True,
            donate=False,
        )
        re, im = dense.zero_state_planar(n)
        ore, oim = fn(re, im)
        got = np.asarray(ore) + 1j * np.asarray(oim)
        assert float(np.max(np.abs(got - want))) < 2e-6

    def test_planar_io_norm_and_amplitudes_ghz(self):
        from quantum_simulations_tpu.runtime import simulator

        n = 14
        fn = simulator.build_window_circuit_fn(
            lib.ghz(n), dtype=jnp.complex64, planar_io=True, inplace=True,
            donate=True,
        )
        re, im = dense.zero_state_planar(n)
        re, im = fn(re, im)
        norm2 = float(jnp.sum(re * re) + jnp.sum(im * im))
        assert abs(norm2 - 1.0) < 1e-5
        assert abs(float(re[0]) - 1 / np.sqrt(2)) < 1e-6
        assert abs(float(re[-1]) - 1 / np.sqrt(2)) < 1e-6


class TestCapacityKernelsParity:
    """Layout-free capacity variants vs the default paths."""

    @pytest.mark.parametrize("qa,qb", [(7, 10), (9, 14), (8, 12), (10, 9)])
    def test_midpair_matches_oracle(self, qa, qb):
        n = 15
        rng = np.random.default_rng(17)
        q, _ = np.linalg.qr(rng.normal(size=(4, 4))
                            + 1j * rng.normal(size=(4, 4)))
        psi = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
        psi = (psi / np.linalg.norm(psi)).astype(np.complex64)
        want = oracle.apply_gate(psi.astype(np.complex128), [qa, qb], q)
        re = jnp.asarray(psi.real)
        im = jnp.asarray(psi.imag)
        for inplace in (False, True):
            ore, oim = pk.midpair_planar(
                re, im, qa, qb, q, interpret=True, inplace=inplace)
            got = np.asarray(ore) + 1j * np.asarray(oim)
            np.testing.assert_allclose(got, want, atol=1e-6)

    @pytest.mark.parametrize("qa,qb", [(10, 18), (11, 16), (12, 17)])
    def test_pair_row_low_inplace(self, qa, qb):
        re, im = _planes(19, 23)
        U = _rand_u(4, 24)
        a = pk.pair_update_planar(re, im, qa, qb, U, interpret=True)
        b = pk.pair_update_planar(
            re, im, qa, qb, U, interpret=True, inplace=True)
        np.testing.assert_allclose(
            np.asarray(a[0]), np.asarray(b[0]), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(a[1]), np.asarray(b[1]), atol=1e-6)

    def test_shear_diag_matches_direct(self):
        from quantum_simulations_tpu.ops import dense as D

        n = 14
        rng = np.random.default_rng(5)
        qs = (2, 8, 9, 12)
        d = np.exp(1j * rng.uniform(-np.pi, np.pi, size=1 << len(qs)))
        # include the tan-singular phases explicitly
        d[0] = -1.0
        d[1] = 1.0
        d[2] = 1j
        d[3] = -1j
        re, im = _planes(n, 31)
        a = D.apply_diag_planar(re, im, qs, d)
        b = D.apply_diag_planar_shear(re, im, qs, d)
        np.testing.assert_allclose(
            np.asarray(a[0]), np.asarray(b[0]), atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(a[1]), np.asarray(b[1]), atol=2e-6)

    def test_window_qft_inplace_matches_oracle(self):
        """QFT drives diag shears + midpair + multiswap at capacity."""
        from quantum_simulations_tpu.runtime import simulator

        n = 14
        cd = lib.qft(n)
        want = oracle.simulate(cd)
        fn = simulator.build_window_circuit_fn(
            cd, dtype=jnp.complex64, planar_io=True, inplace=True,
            donate=False,
        )
        re, im = dense.zero_state_planar(n)
        ore, oim = fn(re, im)
        got = np.asarray(ore) + 1j * np.asarray(oim)
        assert float(np.max(np.abs(got - want))) < 3e-6

    @pytest.mark.parametrize("qs", [(2, 14), (5, 9), (6, 15)])
    def test_shear_2q_mixed_matches_direct(self, qs):
        from quantum_simulations_tpu.ops import dense as D

        n = max(qs) + 2
        rng = np.random.default_rng(7)
        d = np.exp(1j * rng.uniform(-np.pi, np.pi, size=4))
        d[2] = -1.0  # sign-flip branch
        re, im = _planes(n, 41)
        a = D.apply_diag_planar(re, im, qs, d)
        b = D.apply_diag_planar_shear(re, im, qs, d)
        np.testing.assert_allclose(
            np.asarray(a[0]), np.asarray(b[0]), atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(a[1]), np.asarray(b[1]), atol=2e-6)

    def test_shear_row_gather_large_arity(self):
        from quantum_simulations_tpu.ops import dense as D

        n = 16
        rng = np.random.default_rng(9)
        qs = tuple(range(7, 16))
        d = np.exp(1j * rng.uniform(-np.pi, np.pi, size=1 << 9))
        re, im = _planes(n, 43)
        a = D.apply_diag_planar(re, im, qs, d)
        b = D.apply_diag_planar_shear(re, im, qs, d)
        np.testing.assert_allclose(
            np.asarray(a[0]), np.asarray(b[0]), atol=2e-6)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_fused_diag_kernel_matches_direct(self, seed):
        """One-pass fused diag (Möbius terms, in-kernel phases) vs the
        direct broadcast, over an any-mix merged run."""
        from quantum_simulations_tpu.circuit.panelize import (
            diag_phase_terms,
        )
        from quantum_simulations_tpu.ops import dense as D

        n = 15
        rng = np.random.default_rng(50 + seed)
        gates = []
        for _ in range(6):
            a = int(rng.integers(1, 4))
            qs = tuple(int(q) for q in rng.choice(n, size=a, replace=False))
            d = np.exp(1j * rng.uniform(-np.pi, np.pi, size=1 << a))
            gates.append((qs, d))
        # direct: sequential per-gate broadcasts
        re, im = _planes(n, 60 + seed)
        a_re, a_im = re, im
        for qs, d in gates:
            a_re, a_im = D.apply_diag_planar(a_re, a_im, qs, d)
        # fused: accumulated Möbius terms, one kernel pass
        terms: dict = {}
        for qs, d in gates:
            for k, c in diag_phase_terms(qs, d).items():
                k = tuple(sorted(k))
                terms[k] = terms.get(k, 0.0) + c
        for inplace in (False, True):
            b_re, b_im = pk.fused_diag_planar(
                re, im, tuple(terms.items()), interpret=True,
                inplace=inplace)
            np.testing.assert_allclose(
                np.asarray(a_re), np.asarray(b_re), atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(a_im), np.asarray(b_im), atol=1e-5)


class TestBitPerm:
    """bitperm_planar + the terminal-SWAP deferral that feeds it."""

    @staticmethod
    def _ref_perm(x, n, pairs):
        idx = np.arange(1 << n)
        src = np.zeros_like(idx)
        moved = 0
        for a, b in pairs:
            src |= ((idx >> a) & 1) << b
            src |= ((idx >> b) & 1) << a
            moved |= (1 << a) | (1 << b)
        src |= idx & ~moved
        return x[src]

    @pytest.mark.parametrize("n", [15, 16, 18])
    def test_crossing_reversal_matches_numpy(self, n):
        re, im = _planes(n, n)
        pairs = [(q, n - 1 - q) for q in range(7)]
        cross = tuple(n - 1 - q for q in range(7))
        ore, oim = pk.bitperm_cross_planar(re, im, cross, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(ore), self._ref_perm(np.asarray(re), n, pairs))
        np.testing.assert_array_equal(
            np.asarray(oim), self._ref_perm(np.asarray(im), n, pairs))

    def test_crossing_inplace_parity(self):
        n = 16
        re, im = _planes(n, 44)
        cross = tuple(n - 1 - q for q in range(7))
        a = pk.bitperm_cross_planar(re, im, cross, interpret=True)
        b = pk.bitperm_cross_planar(re, im, cross, interpret=True,
                                    inplace=True)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))

    def test_cross_non_reversal_bijection(self):
        n = 15
        re, im = _planes(n, 45)
        # lane l <-> top bit (n-7)+l: a non-reversal bijection.
        cross = tuple((n - 7) + el for el in range(7))
        pairs = [(el, cross[el]) for el in range(7)]
        ore, _ = pk.bitperm_cross_planar(re, im, cross, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(ore), self._ref_perm(np.asarray(re), n, pairs))

    def test_qft_schedule_collapses_swap_tail(self):
        from quantum_simulations_tpu.circuit.panelize import (
            BitPermGridOp, BitPermOp, MultiSwapOp, PhysGateOp,
            TransposeCrossOp, compile_window_schedule,
        )
        ops = compile_window_schedule(lib.qft(18))
        # Terminal bitperm decomposes: one grid pass (mid pairs +
        # residual top permutation via index maps) + a pure transpose;
        # the lane-bit permutation was folded into a pos-0 panel's W.
        assert isinstance(ops[-1], TransposeCrossOp)
        assert isinstance(ops[-2], BitPermGridOp)
        assert not any(isinstance(o, (BitPermOp, MultiSwapOp))
                       for o in ops)
        # No standalone SWAP stragglers remain.
        from quantum_simulations_tpu.ops.dense import _SWAP4
        assert not any(
            isinstance(o, PhysGateOp)
            and np.array_equal(np.asarray(o.U, complex), _SWAP4)
            for o in ops)

    @pytest.mark.parametrize("pairs", [
        ((7, 12),), ((7, 12), (8, 11)), ((10, 14),),
        ((7, 14), (8, 13), (9, 12), (10, 11)), ((7, 9),),
    ])
    def test_swap_kernel_matches_numpy(self, pairs):
        n = 16
        re, im = _planes(n, 7)
        ore, oim = pk.bitperm_swap_planar(re, im, pairs, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(ore), self._ref_perm(np.asarray(re), n, pairs))
        np.testing.assert_array_equal(
            np.asarray(oim), self._ref_perm(np.asarray(im), n, pairs))

    def test_swap_kernel_grid_map_and_split(self):
        # Arbitrary (non-involution) bijection on bits >= 10: a
        # 3-cycle 10 -> 12 -> 14 -> 10, with a sublane pair on top.
        n = 16
        re, im = _planes(n, 9)
        gm = {10: 12, 12: 14, 14: 10}  # out bit <- in bit
        ore, oim = pk.bitperm_swap_planar(
            re, im, ((7, 11),), grid_map=gm, split_planes=True,
            interpret=True)
        idx = np.arange(1 << n)
        src = np.zeros_like(idx)
        moved = 0
        for out_b, in_b in gm.items():
            # bit out_b of sigma(i) = bit in_b of i
            src |= ((idx >> in_b) & 1) << out_b
            moved |= 1 << out_b
        src |= ((idx >> 7) & 1) << 11
        src |= ((idx >> 11) & 1) << 7
        moved |= (1 << 7) | (1 << 11)
        src |= idx & ~moved
        np.testing.assert_array_equal(np.asarray(ore),
                                      np.asarray(re)[src])
        np.testing.assert_array_equal(np.asarray(oim),
                                      np.asarray(im)[src])

    @pytest.mark.parametrize("inplace", [False, True])
    def test_transpose_cross_matches_numpy(self, inplace):
        n = 16
        re, im = _planes(n, 11)
        pairs = [(el, n - 7 + el) for el in range(7)]
        ore, oim = pk.bitperm_transpose_planar(
            re, im, interpret=True, inplace=inplace)
        np.testing.assert_array_equal(
            np.asarray(ore), self._ref_perm(np.asarray(re), n, pairs))
        np.testing.assert_array_equal(
            np.asarray(oim), self._ref_perm(np.asarray(im), n, pairs))

    def test_illegal_pairs_fall_back(self):
        """A terminal lane<->middle SWAP can't ride the kernel."""
        from quantum_simulations_tpu.circuit.panelize import (
            BitPermOp, compile_window_schedule,
        )
        n = 20
        gates = [{"qubits": [q], "gate": "H"} for q in range(n)]
        gates += [{"qubits": [3, 12], "gate": "SWAP"},
                  {"qubits": [2, 11], "gate": "SWAP"}]
        cd = {"number_of_qubits": n, "gates": gates}
        ops = compile_window_schedule(cd)
        assert not any(isinstance(o, BitPermOp) for o in ops)
        got = np.asarray(__import__(
            "quantum_simulations_tpu.runtime.simulator",
            fromlist=["simulate"]).simulate(cd, mode="window"))
        np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-6)

    @pytest.mark.parametrize("n", [16, 17])
    def test_qft_window_mode_oracle(self, n):
        from quantum_simulations_tpu.runtime import simulator
        got = np.asarray(simulator.simulate(lib.qft(n), mode="window"))
        np.testing.assert_allclose(got, oracle.simulate(lib.qft(n)),
                                   atol=2e-6)


class TestTermsOnlyDiagMerge:
    """Capacity-tier unbounded diag merge (terms-only DiagOps)."""

    def test_qft_terms_only_schedule_and_oracle(self):
        from quantum_simulations_tpu.circuit.panelize import (
            DiagOp, compile_window_schedule,
        )
        from quantum_simulations_tpu.runtime import simulator
        n = 16
        cd = lib.qft(n)
        ops = compile_window_schedule(cd, diag_terms_only=True)
        diags = [o for o in ops if isinstance(o, DiagOp)]
        assert diags and all(o.d is None and o.terms for o in diags)
        capped = compile_window_schedule(cd)
        assert len(diags) <= sum(isinstance(o, DiagOp) for o in capped)
        fn = simulator.build_window_circuit_fn(
            cd, dtype="complex64", inplace=True, planar_io=True,
            donate=False)
        re, im = dense.zero_state_planar(n)
        re, im = fn(re, im)
        got = np.asarray(re) + 1j * np.asarray(im)
        np.testing.assert_allclose(got, oracle.simulate(cd), atol=2e-6)

    def test_fused_diag_group_path(self):
        """>=3 cross terms sharing a lane subset hit the factored path."""
        n = 14
        gates = [{"qubits": [q], "gate": "H"} for q in range(n)]
        # Three CRs sharing control qubit 2 (lane) with high targets:
        # their cross terms all carry lane subset (2,).
        gates += [{"qubits": [2, t], "gate": "CR", "params": {"k": k}}
                  for k, t in [(2, 9), (3, 10), (4, 11), (5, 12)]]
        cd = {"number_of_qubits": n, "gates": gates}
        from quantum_simulations_tpu.circuit.panelize import (
            compile_window_schedule, DiagOp,
        )
        ops = compile_window_schedule(cd, diag_terms_only=True)
        diag = [o for o in ops if isinstance(o, DiagOp)]
        assert diag, "expected a merged diag run"
        from quantum_simulations_tpu.runtime import simulator
        fn = simulator.build_window_circuit_fn(
            cd, dtype="complex64", inplace=True, planar_io=True,
            donate=False)
        re, im = dense.zero_state_planar(n)
        re, im = fn(re, im)
        got = np.asarray(re) + 1j * np.asarray(im)
        np.testing.assert_allclose(got, oracle.simulate(cd), atol=2e-6)
