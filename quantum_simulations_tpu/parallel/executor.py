"""Sharded circuit execution: shard_map over the device mesh.

The per-device program applies a step's local ops to its (2^k,) shard
with the same fused jnp/MXU paths as the single-device engine, and
cross-shard gates via the XOR-offset ppermute decomposition
(``ops/exchange.py``).  Everything is traced into one XLA program per
step (or one for the whole circuit), so XLA overlaps collectives with
local compute and fuses elementwise chains between them.

This tier replaces the reference's runner fan-out (Spark task shipping
+ shared-FS chunk files, ``wenbo_engine/runner/spark_runner.py``) and
its MPI amplitude exchange (``hisvsim_repo/mpi_redistributer.hpp``)
with SPMD collectives over ICI.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..circuit.contract import circuit_hash, validate_circuit_dict
from ..circuit.fusion import Step, compile_steps
from ..ops import exchange
from ..runtime.simulator import apply_local_ops
from .mesh import AXIS, shard_width
from .reshard import plan_boundary_reshard, swap_device_bits


def _steps_body(steps: list[Step], k: int, axis_name: str):
    def body(shard):
        shard = shard.reshape(-1)
        for step in steps:
            shard = apply_local_ops(shard, step.local_ops)
            # A leading run of disjoint boundary SWAPs (staging's stage
            # transition) collapses into ONE all_to_all reshard instead
            # of one full-shard ppermute per SWAP.
            pairs, rest = plan_boundary_reshard(step.nonlocal_ops, k)
            if pairs:
                # One collective of 2^k*(1-2^-r) amplitudes replaces r
                # full-shard ppermutes (r=1: half-volume, still a win).
                shard = swap_device_bits(shard, axis_name, k, pairs)
            for op in rest:
                shard = exchange.apply_nonlocal(
                    shard, axis_name, k, op.qubits, op.U
                )
        return shard
    return body


def build_steps_fn(mesh: Mesh, n: int, steps: list[Step], *, donate: bool = True):
    """jitted fn(psi_global) applying `steps` to the sharded state."""
    k = shard_width(mesh, n)
    if mesh.size == 1:
        # Single device: no collectives; skip shard_map entirely.
        def run(psi):
            body = _steps_body(steps, k, AXIS)
            return body(psi)
    else:
        body = _steps_body(steps, k, AXIS)
        mapped = shard_map(
            body, mesh=mesh, in_specs=P(AXIS), out_specs=P(AXIS),
        )

        def run(psi):
            return mapped(psi)

    return jax.jit(run, donate_argnums=(0,) if donate else ())


_CACHE: dict = {}


def build_circuit_fns(
    mesh: Mesh,
    circuit_dict: dict,
    *,
    use_fusion: bool = True,
    panel_width: int | None = 7,
    per_step: bool = False,
    donate: bool = True,
):
    """Compile a circuit for the mesh.

    Returns ``(steps, fns)`` where ``fns`` is a single jitted
    whole-circuit function (per_step=False) or one jitted function per
    step (per_step=True — the WAL/checkpoint runner's granularity).
    """
    cd = validate_circuit_dict(circuit_dict)
    n = cd["number_of_qubits"]
    k = shard_width(mesh, n)
    # Stable mesh identity (device ids + axis names): id(mesh) can be
    # reused by a different mesh after garbage collection.
    mesh_key = (tuple(d.id for d in mesh.devices.flat), mesh.axis_names)
    key = (
        circuit_hash(cd), mesh_key, use_fusion, panel_width, per_step, donate,
    )
    hit = _CACHE.get(key)
    if hit is not None:
        return hit
    steps = compile_steps(cd, k=k, use_fusion=use_fusion, panel_width=panel_width)
    if per_step:
        fns = [build_steps_fn(mesh, n, [s], donate=donate) for s in steps]
    else:
        fns = build_steps_fn(mesh, n, steps, donate=donate)
    _CACHE[key] = (steps, fns)
    return steps, fns


def simulate_sharded(
    mesh: Mesh,
    circuit_dict: dict,
    *,
    dtype=jnp.complex64,
    use_fusion: bool = True,
    panel_width: int | None = 7,
    initial_state=None,
) -> jax.Array:
    """Run a circuit on the mesh; returns the (sharded) global state."""
    from .mesh import put_state, zero_state_sharded

    cd = validate_circuit_dict(circuit_dict)
    n = cd["number_of_qubits"]
    _, fn = build_circuit_fns(
        mesh, cd, use_fusion=use_fusion, panel_width=panel_width,
        donate=True,
    )
    if initial_state is None:
        psi = zero_state_sharded(mesh, n, dtype)
    else:
        psi = put_state(mesh, initial_state, dtype)
    return fn(psi)


def collect_state(psi: jax.Array) -> np.ndarray:
    """Gather the sharded state to host numpy (test/debug path)."""
    from ..utils.transfer import fetch_array

    return fetch_array(psi)
