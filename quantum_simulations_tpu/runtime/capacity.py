"""Capacity tier (n >= 29): planar end-to-end execution + readout.

The reference exposes its out-of-core ceiling (n=30, 631 s on disk)
through the same ``run()`` entry every user calls
(``wenbo_engine/runner/single_node.py:78``); this module is the
equivalent product surface for the TPU capacity tier: the state is
born as (re, im) f32 planes (a complex64 copy would not fit next to
them on a 16 GiB chip), every kernel pass aliases in->out
(``input_output_aliases``), and readout — norm, top amplitudes,
sampling, diagonal observables — happens on the planes without ever
materializing the complex vector (``ops/sampling.py`` planar readout).

Reachable from :func:`api.simulate` / the CLI via
``SimulatorConfig(mode="capacity")`` (and ``mode="auto"`` at n >= 29).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..circuit.contract import validate_circuit_dict
from ..ops import sampling


class CapacityResult:
    """Handle on a planar statevector living on-device.

    Duck-types the readout surface of ``sparse.engine.SparseState``
    (``top_amplitudes``/``norm``) so the CLI prints both tiers with one
    code path.  Nothing here gathers the 2^n state: fetches are scalars
    and (k,)/(shots, n) arrays.
    """

    def __init__(self, re: jax.Array, im: jax.Array, n: int):
        self.re = re
        self.im = im
        self.n = n

    def norm2(self) -> float:
        return float(jax.device_get(
            jax.jit(sampling.norm2_planar)(self.re, self.im)))

    def norm(self) -> float:
        return self.norm2() ** 0.5

    def top_amplitudes(self, k: int = 8) -> list[tuple[int, complex]]:
        idx, _, ar, ai = jax.jit(
            sampling.top_amplitudes_planar, static_argnums=2,
        )(self.re, self.im, k)
        return [
            (int(i), complex(float(r), float(j)))
            for i, r, j in zip(np.asarray(jax.device_get(idx)),
                               np.asarray(jax.device_get(ar)),
                               np.asarray(jax.device_get(ai)))
        ]

    def sample_bits(self, shots: int, n: int | None = None, *,
                    seed: int = 0) -> np.ndarray:
        bits = jax.jit(
            sampling.sample_bits_planar, static_argnums=(3, 4),
        )(self.re, self.im, jax.random.PRNGKey(seed), shots,
          n or self.n)
        return np.asarray(jax.device_get(bits))

    def expectation_z(self, qubits: list[int]) -> float:
        fn = jax.jit(lambda re, im: sampling.expectation_z_planar(
            re, im, list(qubits)))
        return float(jax.device_get(fn(self.re, self.im)))

    def qubit_probability(self, q: int) -> float:
        fn = jax.jit(lambda re, im: sampling.qubit_probability_planar(
            re, im, q))
        return float(jax.device_get(fn(self.re, self.im)))

    def to_array(self) -> np.ndarray:
        """Materialize the dense complex state on host (small n /
        tests only — at n >= 29 this is a 2x-state transfer)."""
        re = np.asarray(jax.device_get(self.re))
        im = np.asarray(jax.device_get(self.im))
        return (re + 1j * im).astype(np.complex64)

    def summary(self, top: int = 8) -> dict:
        return {
            "n_qubits": self.n,
            "mode": "capacity",
            "norm2": self.norm2(),
            "top": [[hex(i), [a.real, a.imag]]
                    for i, a in self.top_amplitudes(top)],
        }


def simulate_capacity(
    circuit_dict: dict,
    *,
    dtype=jnp.complex64,
    window: int = 7,
    initial_planes=None,
) -> CapacityResult:
    """Run a circuit planar end-to-end on one device.

    The in-place planar window program (see
    ``runtime/simulator.build_window_circuit_fn``): zero extra HBM per
    pass, planar i/o, f32 planes donated between the init and the
    program.  Gates with no in-place planar kernel raise a clear
    ``ValueError`` at compile time instead of an XLA OOM (non-diagonal
    3q+ gates straddling the lane window — decompose them first).
    """
    from . import simulator

    cd = validate_circuit_dict(circuit_dict)
    n = cd["number_of_qubits"]
    fn = simulator.build_window_circuit_fn(
        cd, dtype=dtype, window=window, planar_io=True, inplace=True,
        donate=True,
    )
    if initial_planes is None:
        from ..ops import dense

        re, im = jax.jit(lambda: dense.zero_state_planar(n))()
    else:
        re, im = initial_planes
    re, im = fn(re, im)
    return CapacityResult(re, im, n)
