"""High-level user API: one facade over every execution tier.

A user of the reference framework drives it through
``runner.run(circuit_dict, work_dir, chunk_size=..., kernel=...)`` or
the v2/v3 ``driver.run_circuit``; this module is the equivalent single
entry point, routing to the right tier from a
:class:`~quantum_simulations_tpu.utils.config.SimulatorConfig`:

* dense in-HBM (single device or sharded mesh), fused or panel mode,
  optional staging / WAL / fencing;
* out-of-core spill (host DRAM or disk chunks) when ``stripe_qubits``
  is set;
* sparse (COO / bigint) when ``sparse`` is set.

.. code-block:: python

    from quantum_simulations_tpu import api
    result = api.simulate(circuit, config=SimulatorConfig(mode="panel"))
    samples = api.sample(circuit, shots=1000)
"""
from __future__ import annotations

import numpy as np

from .circuit.contract import has_nonunitary, validate_circuit_dict
from .utils.config import SimulatorConfig


def simulate(circuit_dict: dict, config: SimulatorConfig | None = None,
             *, work_dir=None) -> np.ndarray:
    """Run a circuit under the given config; returns the final state.

    Sparse runs return a :class:`sparse.engine.SparseState` instead of
    a dense array (it may not fit memory densely).  Circuits containing
    RESET / mid-circuit MEASURE / conditional gates route to the
    trajectory tier (seeded by ``config.trajectory_seed``).
    """
    cfg = config or SimulatorConfig()
    if has_nonunitary(circuit_dict):
        import jax.numpy as jnp

        from .runtime.trajectory import simulate_trajectory

        psi, _, _ = simulate_trajectory(
            circuit_dict, seed=cfg.trajectory_seed,
            dtype=jnp.dtype(cfg.dtype), use_fusion=cfg.use_fusion,
            panel_width=cfg.panel_width,
        )
        return psi
    cd = validate_circuit_dict(circuit_dict)

    if cfg.log_level:
        import logging

        from .utils.logging import setup_logging

        setup_logging(getattr(logging, cfg.log_level.upper(), logging.INFO))

    if cfg.sparse == "auto":
        # Adaptive tier: sparse until the intermediate nnz profile says
        # the state has densified, then the dense engine takes over.
        from .sparse.adaptive import simulate_adaptive

        res = simulate_adaptive(
            cd, threshold=cfg.sparse_threshold, dtype=cfg.dtype,
            mode=cfg.mode if cfg.mode in ("fused", "window") else "fused",
        )
        return res.state

    if cfg.sparse:
        from .sparse.engine import simulate_sparse

        return simulate_sparse(cd, threshold=cfg.sparse_threshold)

    n = cd["number_of_qubits"]
    capacity = cfg.mode == "capacity" or (cfg.mode == "auto" and n >= 29)
    if (capacity and not cfg.sparse and cfg.stripe_qubits is None
            and (cfg.n_devices or 1) == 1 and work_dir is None):
        # Single-chip capacity tier (n >= 29): planar in-place programs,
        # planar readout — the product surface over bench/capacity.py's
        # measured n=30 path (reference ceiling: single_node.py:78 run()
        # reaching n=30 out-of-core).
        from .runtime.capacity import simulate_capacity

        return simulate_capacity(cd, dtype=cfg.dtype)

    if cfg.stripe_qubits is not None:
        from .runtime import spill

        out = spill.run_out_of_core(
            cd, stripe_qubits=cfg.stripe_qubits, backend=cfg.spill_backend,
            work_dir=work_dir, dtype=cfg.dtype, use_fusion=cfg.use_fusion,
            panel_width=cfg.panel_width, use_staging=cfg.use_staging,
            staging_method=cfg.staging_method, transfer=cfg.spill_transfer,
        )
        if cfg.spill_backend == "disk":
            return spill.collect_state(out)
        return out

    n_devices = cfg.n_devices or 1
    if n_devices > 1 or work_dir is not None:
        from .parallel import mesh as M
        from .runtime import runner

        mesh = M.make_mesh(n_devices)
        if work_dir is not None:
            runner_mode = (
                "capacity" if capacity
                else "window" if cfg.mode == "window"
                else "fused"
            )
            runner.run(
                cd, work_dir, mesh=mesh, dtype=cfg.dtype, mode=runner_mode,
                use_wal=cfg.use_wal, use_fencing=cfg.use_fencing,
                use_fusion=cfg.use_fusion, panel_width=cfg.panel_width,
                use_staging=cfg.use_staging,
                staging_method=cfg.staging_method,
                checkpoint_every=cfg.checkpoint_every,
                max_levels_per_step=cfg.max_levels_per_step,
                event_log=cfg.event_log,
            )
            return runner.collect_state(work_dir)
        from .parallel import executor as E

        return E.collect_state(E.simulate_sharded(
            mesh, cd, dtype=cfg.dtype, use_fusion=cfg.use_fusion,
            panel_width=cfg.panel_width,
            mode="window" if cfg.mode == "window" else "fused",
        ))

    from .runtime import simulator

    return simulator.simulate_np(
        cd, dtype=cfg.dtype, mode=cfg.mode, use_fusion=cfg.use_fusion,
        panel_width=cfg.panel_width, segment_gates=cfg.segment_gates,
    )


def sample(circuit_dict: dict, shots: int, *, seed: int = 0,
           config: SimulatorConfig | None = None) -> np.ndarray:
    """Simulate then draw bitstring samples; (shots, n) int8 matrix."""
    import jax

    from .ops import sampling

    cfg = config or SimulatorConfig()
    n = validate_circuit_dict(
        circuit_dict, allow_nonunitary=has_nonunitary(circuit_dict),
    )["number_of_qubits"]
    if has_nonunitary(circuit_dict):
        import jax.numpy as jnp

        psi = simulate(circuit_dict, cfg)  # trajectory tier
        return np.asarray(sampling.sample_bits(
            jnp.asarray(psi), jax.random.PRNGKey(seed), shots, n))
    if (cfg.n_devices or 1) > 1 and not cfg.sparse and cfg.stripe_qubits is None:
        # Sharded tier: keep the state on the mesh and sample SPMD —
        # no host gather of the 2^n vector (the 30-34q target sizes
        # don't fit one host buffer comfortably).
        from .parallel import executor as E
        from .parallel import mesh as M

        mesh = M.make_mesh(cfg.n_devices)
        psi = E.simulate_sharded(
            mesh, circuit_dict, dtype=cfg.dtype, use_fusion=cfg.use_fusion,
            panel_width=cfg.panel_width,
            mode="window" if cfg.mode == "window" else "fused",
        )
        return np.asarray(sampling.sample_bits_sharded(
            psi, jax.random.PRNGKey(seed), shots, n, mesh))
    psi = simulate(circuit_dict, cfg)
    if hasattr(psi, "sample_bits"):
        # SparseState samples over its nnz support directly — no dense
        # 2^n expansion (works at any n, e.g. 1000-qubit GHZ).  An
        # adaptive run that switched tiers returns a dense array and
        # falls through to the dense sampler below.
        return psi.sample_bits(shots, n, seed=seed)
    import jax.numpy as jnp

    return np.asarray(sampling.sample_bits(
        jnp.asarray(psi), jax.random.PRNGKey(seed), shots, n,
    ))


def expectation_z(circuit_dict: dict, qubits: list[int],
                  config: SimulatorConfig | None = None) -> float:
    import jax.numpy as jnp

    from .ops import sampling

    cfg = config or SimulatorConfig()
    n = validate_circuit_dict(circuit_dict)["number_of_qubits"]
    if (cfg.n_devices or 1) > 1 and not cfg.sparse and cfg.stripe_qubits is None:
        # Stay on the mesh: per-shard partial sums + psum, no gather.
        from .parallel import executor as E
        from .parallel import mesh as M

        mesh = M.make_mesh(cfg.n_devices)
        psi = E.simulate_sharded(
            mesh, circuit_dict, dtype=cfg.dtype, use_fusion=cfg.use_fusion,
            panel_width=cfg.panel_width,
            mode="window" if cfg.mode == "window" else "fused",
        )
        return float(sampling.expectation_z_sharded(psi, qubits, n, mesh))
    psi = simulate(circuit_dict, cfg)
    if hasattr(psi, "expectation_z"):  # capacity tier: planar readout
        return float(psi.expectation_z(qubits))
    return float(sampling.expectation_z(jnp.asarray(psi), qubits))


def expectation_pauli(circuit_dict: dict, pauli: str | dict[int, str],
                      config: SimulatorConfig | None = None) -> float:
    """<psi| P |psi> for a Pauli string ('XZIY...' little-endian or
    {qubit: letter}).

    Non-Z axes are rotated into Z by APPENDING the basis-change layer
    (H for X, S-dagger then H for Y) to the circuit, then taking the
    Z-string expectation through :func:`expectation_z` — so every tier
    evaluates natively: the sharded tier reduces per shard + ``psum``
    (no 2^n gather, unlike a host-side basis change), the capacity
    tier stays planar (see ops/observables.py for the identity).
    """
    from .circuit.contract import validate_circuit_dict as _v
    from .ops.observables import parse_pauli

    cfg = config or SimulatorConfig()
    cd = _v(circuit_dict)
    ps = parse_pauli(pauli)
    basis: list[dict] = []
    for q in sorted(ps):
        if ps[q] == "Y":
            basis.append({"qubits": [q], "gate": "SDG"})
        if ps[q] in ("X", "Y"):
            basis.append({"qubits": [q], "gate": "H"})
    rotated = {"number_of_qubits": cd["number_of_qubits"],
               "gates": list(cd["gates"]) + basis}
    return expectation_z(rotated, sorted(ps), cfg)
