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


def _apply_nonlocal_phase(shard, step: Step, k: int, axis_name: str):
    """Reshard-collapsed boundary SWAPs, then per-gate exchanges."""
    # A step's disjoint boundary SWAPs (staging's stage transition)
    # collapse into ONE all_to_all reshard instead of one full-shard
    # ppermute per SWAP (r=1: half-volume, still a win).
    pairs, rest = plan_boundary_reshard(step.nonlocal_ops, k)
    if pairs:
        shard = swap_device_bits(shard, axis_name, k, pairs)
    for op in rest:
        shard = exchange.apply_nonlocal(shard, axis_name, k, op.qubits, op.U)
    return shard


def _apply_nonlocal_phase_planar(re, im, step: Step, k: int, axis_name: str,
                                 dtype, inplace: bool):
    """Cross-shard phase on f32 planes.

    Boundary-reshard SWAPs are pure index permutations, so they run on
    each plane directly (two f32 ``all_to_all``s ship the same bytes as
    one complex one — no conversion pass).  ZERO-TRAFFIC gates (device
    bits insular — diagonal gates and device-bit controls, everything
    staging leaves above the boundary) apply their W_0 block on the
    planes, dispatched by this device's bit values via ``lax.switch``
    (one branch executes — no 2^r variant materialization).  Only
    genuinely exchanging gates use the complex XOR-offset path; at
    capacity (``inplace``) that conversion would double the shard
    footprint, so it is rejected at trace time — staged circuits never
    hit it.
    """
    from ..ops import pallas_kernels as pk

    pairs, rest = plan_boundary_reshard(step.nonlocal_ops, k)
    if pairs:
        re = swap_device_bits(re, axis_name, k, pairs)
        if inplace:
            re, im = jax.lax.optimization_barrier((re, im))
        im = swap_device_bits(im, axis_name, k, pairs)
    exchanging = []
    for op in rest:
        if exchange.exchange_cost(np.asarray(op.U), tuple(op.qubits), k) == 0:
            if exchanging:  # keep program order within the step's level
                re, im = _planar_exchange(re, im, exchanging, k, axis_name,
                                          dtype, inplace)
                exchanging = []
            re, im = _planar_zero_traffic(re, im, op, k, axis_name, inplace)
            if inplace:
                re, im = jax.lax.optimization_barrier((re, im))
        else:
            exchanging.append(op)
    if exchanging:
        re, im = _planar_exchange(re, im, exchanging, k, axis_name, dtype,
                                  inplace)
    return re, im


def _planar_exchange(re, im, ops, k, axis_name, dtype, inplace):
    """Genuinely-exchanging gates: complex XOR-offset path (guarded)."""
    from ..ops import pallas_kernels as pk
    from ..runtime.simulator import _capacity_guard_min

    if inplace and re.size >= _capacity_guard_min():
        names = [getattr(op, "name", "?") for op in ops]
        raise ValueError(
            f"capacity mode: non-SWAP cross-shard gates {names} need the "
            f"complex exchange path, which materializes a second copy of "
            f"the shard (2x memory) and does not fit at n >= 29 shard "
            f"sizes. Enable staging (use_staging=True) so cross-shard "
            f"traffic collapses into boundary SWAP reshards."
        )
    c = pk.from_planar(re, im, dtype)
    for op in ops:
        c = exchange.apply_nonlocal(c, axis_name, k, op.qubits, op.U)
    return pk.to_planar(c)


def _planar_zero_traffic(re, im, op, k, axis_name, inplace):
    """Apply a zero-traffic cross-shard gate directly on f32 planes.

    The gate's device-bit qubits are insular (never flipped), so the
    local update is the W_0 sub-block selected by this device's bit
    values: ``lax.switch`` over the 2^r constant blocks, each branch a
    planar application (scalar phase when no local qubits).  This is
    the runtime half of the insular relaxation (the reference only
    schedules around it, ``wenbo_engine/circuit/staging.py:65-98``) —
    on the capacity tier it keeps T/CZ/CR/controls on device bits from
    ever forcing a complex conversion.
    """
    from jax import lax

    from ..ops import dense
    from ..runtime.simulator import _capacity_guard_min

    U = np.asarray(op.U, dtype=np.complex128)
    qubits = tuple(op.qubits)
    dev = [q for q in qubits if q >= k]
    loc = tuple(q for q in qubits if q < k)
    r = len(dev)

    a_scalar = sum(
        (((lax.axis_index(axis_name) >> (q - k)) & 1) * (1 << (r - 1 - t))
         for t, q in enumerate(dev)),
        start=jnp.int32(0),
    )

    def make_branch(a: int):
        W = exchange.zero_offset_block(U, qubits, k, a)

        def branch(planes):
            pre, pim = planes
            if not loc:
                c = complex(W[0, 0])
                if c == 1.0:
                    return pre, pim
                cr = np.float32(c.real) if pre.dtype == jnp.float32 \
                    else np.float64(c.real)
                ci = np.float32(c.imag) if pre.dtype == jnp.float32 \
                    else np.float64(c.imag)
                if c.imag == 0.0:
                    return cr * pre, cr * pim
                return cr * pre - ci * pim, ci * pre + cr * pim
            out = dense.apply_gate_planar(pre, pim, loc, W)
            if out is not None:
                return out
            if inplace and pre.size >= _capacity_guard_min():
                raise ValueError(
                    f"capacity mode: zero-traffic gate "
                    f"{getattr(op, 'name', '?')} on {qubits} has a local "
                    f"block with no planar path; decompose the gate.")
            from ..ops import pallas_kernels as pk

            c64 = dense.apply_gate(
                pk.from_planar(pre, pim, jnp.complex64), loc, W)
            return pk.to_planar(c64)

        return branch

    return lax.switch(a_scalar, [make_branch(a) for a in range(1 << r)],
                      (re, im))


def _steps_body(steps: list[Step], k: int, axis_name: str):
    def body(shard):
        shard = shard.reshape(-1)
        for step in steps:
            shard = apply_local_ops(shard, step.local_ops)
            shard = _apply_nonlocal_phase(shard, step, k, axis_name)
        return shard
    return body


def _window_steps_body(steps: list[Step], k: int, axis_name: str,
                       interpret: bool, *, inplace: bool = False,
                       planar_io: bool = False, dtype=jnp.complex64):
    """Shard body running each step's local ops through the planar
    Pallas window panels (the single-chip flagship path, 530-548 GB/s
    measured vs 310 GB/s for the XLA panel matmul) inside shard_map.

    Local gates are window-scheduled over the k shard-local qubits at
    trace time; boundary-reshard SWAPs run per plane, generic
    cross-shard phases on the complex representation (the
    planar<->complex conversions are elementwise and fuse into the
    neighbouring passes).

    ``inplace`` (sharded capacity, e.g. 2^30-amplitude shards at 34q on
    a 16-chip pod): every Pallas pass aliases in->out and an
    optimization barrier pins one op at a time, so a shard never needs
    a second copy of itself in HBM.  ``planar_io`` makes the body take
    and return (re, im) f32 planes — required at capacity, where the
    complex form never exists.
    """
    from ..circuit.panelize import compile_window_ops
    from ..ops import pallas_kernels as pk
    from ..runtime.simulator import apply_window_op, pair_panel_diag

    # Same gate as the single-chip tier: the small-table fused-diag
    # kernel makes unbounded merged diag runs cost one pass each, so
    # shard-local phase sweeps merge too (QST_DIAG_TERMS_ONLY=0 reverts).
    import os as _os
    terms_only = inplace or (
        k >= 10 and _os.environ.get("QST_DIAG_TERMS_ONLY", "1") == "1")
    win_ops = [
        pair_panel_diag(compile_window_ops(
            [(op.qubits, op.U, getattr(op, "name", "panel"))
             for op in s.local_ops],
            k,
            diag_terms_only=terms_only,
        ))
        for s in steps
    ]

    def run_steps(re, im, dt):
        for step, wops in zip(steps, win_ops):
            for op, dterms in wops:
                re, im = apply_window_op(re, im, op, dt, interpret,
                                         inplace, diag_terms=dterms)
                if inplace:
                    re, im = jax.lax.optimization_barrier((re, im))
            if step.nonlocal_ops:
                re, im = _apply_nonlocal_phase_planar(
                    re, im, step, k, axis_name, dt, inplace)
        return re, im

    if planar_io:
        def body(re, im):
            re, im = run_steps(re.reshape(-1), im.reshape(-1), dtype)
            return re, im
    else:
        def body(shard):
            shard = shard.reshape(-1)
            re, im = pk.to_planar(shard)
            re, im = run_steps(re, im, shard.dtype)
            return pk.from_planar(re, im, shard.dtype)

    return body


def build_steps_fn(mesh: Mesh, n: int, steps: list[Step], *,
                   donate: bool = True, mode: str = "fused",
                   interpret: bool | None = None, inplace: bool = False,
                   planar_io: bool = False, dtype=jnp.complex64):
    """jitted fn(psi_global) applying `steps` to the sharded state.

    ``mode='window'`` runs each shard's local ops through the planar
    Pallas window panels (``interpret`` defaults to True off-TPU so the
    virtual CPU mesh can execute the kernels).  ``planar_io`` (window
    only) makes the fn take/return (re, im) f32 plane arrays instead of
    a complex vector; ``inplace`` aliases every kernel pass in->out
    (the capacity tier — shards too big for a second HBM copy).
    """
    k = shard_width(mesh, n)
    if planar_io and mode != "window":
        raise ValueError("planar_io requires mode='window'")
    if mode == "window":
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        body = _window_steps_body(steps, k, AXIS, interpret,
                                  inplace=inplace, planar_io=planar_io,
                                  dtype=dtype)
    else:
        body = _steps_body(steps, k, AXIS)
    if mesh.size == 1:
        # Single device: no collectives; skip shard_map entirely.
        run = body
    else:
        # check_vma=False: pallas_call outputs don't carry varying-
        # across-mesh annotations, and every op here is manifestly
        # per-shard (collectives are explicit ppermute/all_to_all).
        specs = (P(AXIS), P(AXIS)) if planar_io else P(AXIS)
        run = shard_map(
            body, mesh=mesh, in_specs=specs, out_specs=specs,
            check_vma=(mode != "window"),
        )

    donate_args = ((0, 1) if planar_io else (0,)) if donate else ()
    return jax.jit(run, donate_argnums=donate_args)


_CACHE: dict = {}


def build_circuit_fns(
    mesh: Mesh,
    circuit_dict: dict,
    *,
    use_fusion: bool = True,
    panel_width: int | None = 7,
    per_step: bool = False,
    donate: bool = True,
    mode: str = "fused",
    interpret: bool | None = None,
    inplace: bool = False,
    planar_io: bool = False,
    dtype=jnp.complex64,
    max_levels_per_step: int | None = None,
):
    """Compile a circuit for the mesh.

    Returns ``(steps, fns)`` where ``fns`` is a single jitted
    whole-circuit function (per_step=False) or one jitted function per
    step (per_step=True — the WAL/checkpoint runner's granularity).
    ``mode='window'`` uses the planar Pallas window path for each
    shard's local ops (the fast single-chip kernels, now sharded);
    ``planar_io``/``inplace`` as in :func:`build_steps_fn`.
    ``max_levels_per_step`` bounds step granularity so the durability
    runner has real checkpoint cadence even when every gate is local
    (see ``fusion.batch_levels``).
    """
    cd = validate_circuit_dict(circuit_dict)
    n = cd["number_of_qubits"]
    k = shard_width(mesh, n)
    if mode == "window":
        panel_width = None  # window scheduling composes its own panels
    # Stable mesh identity (device ids + axis names): id(mesh) can be
    # reused by a different mesh after garbage collection.
    mesh_key = (tuple(d.id for d in mesh.devices.flat), mesh.axis_names)
    key = (
        circuit_hash(cd), mesh_key, use_fusion, panel_width, per_step,
        donate, mode, interpret, inplace, planar_io,
        jnp.dtype(dtype).name, max_levels_per_step,
    )
    hit = _CACHE.get(key)
    if hit is not None:
        return hit
    steps = compile_steps(cd, k=k, use_fusion=use_fusion, panel_width=panel_width,
                          max_levels_per_step=max_levels_per_step)
    kw = dict(donate=donate, mode=mode, interpret=interpret,
              inplace=inplace, planar_io=planar_io, dtype=dtype)
    if per_step:
        fns = [build_steps_fn(mesh, n, [s], **kw) for s in steps]
    else:
        fns = build_steps_fn(mesh, n, steps, **kw)
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
    mode: str = "fused",
    interpret: bool | None = None,
) -> jax.Array:
    """Run a circuit on the mesh; returns the (sharded) global state."""
    from .mesh import put_state, zero_state_sharded

    cd = validate_circuit_dict(circuit_dict)
    n = cd["number_of_qubits"]
    _, fn = build_circuit_fns(
        mesh, cd, use_fusion=use_fusion, panel_width=panel_width,
        donate=True, mode=mode, interpret=interpret,
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
