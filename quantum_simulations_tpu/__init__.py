"""quantum_simulations_tpu — a TPU-native quantum statevector simulation framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capability set of
``onofreiandrea/quantum_simulations``: the 2^n-amplitude statevector is
sharded over a TPU device mesh, local gates run as fused batched
2x2/4x4 updates (XLA-fused elementwise + MXU matmul panels, Pallas for
the hot paths), cross-shard gates exchange amplitudes with
``ppermute``/``all_to_all`` collectives over ICI, a qubit-reordering
scheduler keeps hot qubits in the local index range, and the
durability tier (step WAL + double-buffered checkpoints + fencing +
crash injection) makes long runs fault-tolerant.  Sparse (GHZ/W-class)
and out-of-core (host-DRAM / disk spill) tiers extend reach beyond
dense HBM capacity.
"""
from .circuit.contract import (
    ENDIANNESS,
    levelize,
    validate_circuit_dict,
)
from .circuit import gates, library
from .oracle import dense_numpy as oracle
from .utils.config import SimulatorConfig

__version__ = "0.1.0"


def simulate(circuit_dict, config=None, **kw):
    """Top-level convenience: see :func:`quantum_simulations_tpu.api.simulate`."""
    from . import api

    return api.simulate(circuit_dict, config, **kw)


def sample(circuit_dict, shots, **kw):
    from . import api

    return api.sample(circuit_dict, shots, **kw)


__all__ = [
    "ENDIANNESS",
    "validate_circuit_dict",
    "levelize",
    "gates",
    "library",
    "oracle",
    "simulate",
    "sample",
    "SimulatorConfig",
    "__version__",
]
