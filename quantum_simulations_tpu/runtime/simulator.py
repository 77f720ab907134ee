"""Single-device dense simulator: the whole statevector in one device's HBM.

The circuit is compiled (levelize -> fuse -> low-panel pack) and traced
into ONE XLA program; XLA fuses consecutive elementwise gate updates
into shared HBM sweeps and runs low-panel blocks on the MXU.  This is
the TPU analogue of the reference's in-memory tier
(``wenbo_engine/kernel/ref_dense.py`` + ``hisvsim_repo/state_vector.hpp``),
reaching n ~= 30 in complex64 on a 16 GB chip.

Compiled programs are cached by circuit hash so repeated runs (bench
loops, parameter sweeps over the same structure) pay tracing once.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..circuit import gates as G
from ..circuit.contract import circuit_hash, validate_circuit_dict
from ..circuit.fusion import GateOp, LowPanelOp, compile_steps
from ..ops import dense


def apply_local_ops(psi: jnp.ndarray, ops: list) -> jnp.ndarray:
    """Apply a list of local ops (GateOp | LowPanelOp) to a flat shard.

    On the CPU backend an ``optimization_barrier`` separates the ops:
    XLA:CPU over-fuses long chains of gather-shaped gate updates into
    one mega-fusion whose per-element recomputation grows with chain
    depth (a 71-gate n=18 QASMBench circuit ran >300 s fused vs 3 s
    barriered).  TPU keeps free rein — its fusions (diag epilogues
    into matmuls etc.) are the measured-fast path.
    """
    barrier = jax.default_backend() == "cpu"
    for op in ops:
        if isinstance(op, LowPanelOp):
            psi = dense.apply_low_panel(psi, op.W)
        else:
            psi = dense.apply_gate(psi, op.qubits, op.U)
        if barrier:
            psi = jax.lax.optimization_barrier(psi)
    return psi


_COMPILE_CACHE: dict = {}


def build_circuit_fn(
    circuit_dict: dict,
    *,
    dtype=jnp.complex64,
    use_fusion: bool = True,
    panel_width: int | None = 7,
    donate: bool = True,
):
    """Return a jitted ``fn(psi) -> psi`` applying the whole circuit.

    The input buffer is donated (statevectors are huge; the update is
    logically in-place even though the program is functional).
    """
    cd = validate_circuit_dict(circuit_dict)
    n = cd["number_of_qubits"]
    key = (circuit_hash(cd), jnp.dtype(dtype).name, use_fusion, panel_width, donate)
    cached = _COMPILE_CACHE.get(key)
    if cached is not None:
        return cached

    steps = compile_steps(cd, k=n, use_fusion=use_fusion, panel_width=panel_width)
    all_ops = [op for s in steps for op in (s.local_ops + s.nonlocal_ops)]

    def fn(psi):
        return apply_local_ops(psi, all_ops)

    jitted = jax.jit(fn, donate_argnums=(0,) if donate else ())
    _COMPILE_CACHE[key] = jitted
    return jitted


def build_panel_circuit_fn(
    circuit_dict: dict,
    *,
    dtype=jnp.complex64,
    window: int = 7,
    donate: bool = True,
):
    """jitted fn(psi)->psi in rotating-panel form (see circuit/panelize.py).

    The traced program is a short chain of 128-wide MXU matmuls and
    bit-rotation transposes — near-bandwidth per pass AND a tiny HLO,
    so it compiles orders of magnitude faster than a per-gate unroll.
    """
    from ..circuit.panelize import (
        PanelOp, PhysGateOp, RotateOp, compile_panel_schedule,
    )

    cd = validate_circuit_dict(circuit_dict)
    n = cd["number_of_qubits"]
    key = ("panel", circuit_hash(cd), jnp.dtype(dtype).name, window, donate)
    cached = _COMPILE_CACHE.get(key)
    if cached is not None:
        return cached

    ops, shift = compile_panel_schedule(cd, window=window)

    # NOTE: fusing the rotation into the matmul's output orientation
    # (a transposed dot_general) was measured SLOWER than separate
    # panel + transpose passes on v5e (41 ms vs 14+23 ms at n=28), so
    # the ops run as scheduled.
    def fn(psi):
        barrier = jax.default_backend() == "cpu"  # see apply_local_ops
        for op in ops:
            if isinstance(op, PanelOp):
                psi = dense.apply_low_panel(psi, op.W)
            elif isinstance(op, RotateOp):
                psi = dense.rotate_bits_right(psi, op.r)
            else:
                psi = dense.apply_gate(psi, op.qubits, op.U)
            if barrier:
                psi = jax.lax.optimization_barrier(psi)
        if shift % n:
            psi = dense.rotate_bits_right(psi, (n - shift) % n)
        return psi

    jitted = jax.jit(fn, donate_argnums=(0,) if donate else ())
    _COMPILE_CACHE[key] = jitted
    return jitted


def apply_multiswap_planar(re, im, pairs, inplace=False):
    """Disjoint high-bit SWAPs as ONE multi-axis transpose per plane.

    ``inplace`` (capacity tier): a barrier between the two plane
    transposes keeps only ONE 4 GiB transpose temp live — scheduled
    concurrently they overflowed n=30 by 261 MB.  (They are both
    bandwidth-bound, so serializing costs nothing.)
    """
    n = int(np.log2(re.size))
    bits = sorted({b for p in pairs for b in p}, reverse=True)
    shape: list[int] = []
    axis_of: dict[int, int] = {}
    prev = n
    for b in bits:
        shape.extend([1 << (prev - b - 1), 2])
        axis_of[b] = len(shape) - 1
        prev = b
    shape.append(1 << prev)
    perm = list(range(len(shape)))
    for a, b in pairs:
        perm[axis_of[a]], perm[axis_of[b]] = perm[axis_of[b]], perm[axis_of[a]]
    re_t = jnp.transpose(re.reshape(shape), perm).reshape(re.size)
    if inplace:
        re_t, im = jax.lax.optimization_barrier((re_t, im))
    im_t = jnp.transpose(im.reshape(shape), perm).reshape(im.size)
    return re_t, im_t


def apply_window_op(re, im, op, dtype, interpret, inplace=False,
                    diag_terms=None):
    """Dispatch ONE window-schedule op on planar f32 planes.

    The single dispatch table for window execution — used by the
    single-chip window executor and the sharded shard_map body, so
    kernel policy decisions (measured on v5e, see bench/opprof.py)
    live in exactly one place:

    * panels              -> Pallas lane / positioned panel kernels
    * disjoint SWAP runs  -> one multi-axis transpose (MultiSwapOp)
    * single high SWAP    -> XLA swapaxes transpose (360 GB/s; beats
                             the pair kernel's 320 for this one gate)
    * high 2q non-diag    -> Pallas pair-update kernel
    * (lane, high) 2q     -> Pallas mixed-pair kernel
    * everything else     -> planar elementwise / complex mixed paths
    """
    from ..circuit.panelize import (
        BitPermGridOp, BitPermOp, DiagOp, DualPanelOp, MultiSwapOp,
        TransposeCrossOp, WindowPanelOp,
    )
    from ..ops import pallas_kernels as pk

    if isinstance(op, DualPanelOp):
        return pk.dual_panel_planar(
            re, im, op.first.W, op.first.pos, op.second.W, op.second.pos,
            interpret=interpret, inplace=inplace, diag_terms=diag_terms,
            straddle=op.pre_straddle, post_straddle=op.post_straddle)
    if isinstance(op, BitPermGridOp):
        # Mid pairs + residual top permutation in one out-of-place
        # pass (>= 10 bits are pure index-map re-addressing); capacity
        # splits planes to keep peak liveness at 3.
        return pk.bitperm_swap_planar(
            re, im, op.pairs, grid_map=dict(op.grid_map),
            split_planes=inplace, interpret=interpret)
    if isinstance(op, TransposeCrossOp):
        # Native-transpose crossing (768 GB/s vs 333 matmul form);
        # identity block maps make it aliasing-safe at capacity.
        return pk.bitperm_transpose_planar(
            re, im, interpret=interpret, inplace=inplace)
    if isinstance(op, BitPermOp):
        # Terminal SWAP network: the 7 lane<->top transpositions run
        # as ONE aliased crossing pass; middle transpositions ride the
        # multiswap / pair-kernel paths first (disjoint bit sets — the
        # two halves commute).
        if op.mid_pairs:
            from ..circuit.panelize import MultiSwapOp as _MS
            re, im = apply_window_op(re, im, _MS(op.mid_pairs), dtype,
                                     interpret, inplace)
            if inplace:
                re, im = jax.lax.optimization_barrier((re, im))
        return pk.bitperm_cross_planar(re, im, op.cross,
                                       interpret=interpret,
                                       inplace=inplace)
    if isinstance(op, WindowPanelOp):
        # ``diag_terms`` (from the executor's peephole over
        # panel+merged-diag pairs) fuses the following DiagOp into this
        # panel pass as an in-VMEM epilogue — the diag's HBM pass
        # disappears and its cos/sin rides the panel's idle VPU.
        if op.pos == 0:
            return pk.panel_apply_planar(
                re, im, op.W, interpret=interpret, inplace=inplace,
                diag_terms=diag_terms)
        return pk.positioned_panel_planar(
            re, im, op.W, op.pos, interpret=interpret, inplace=inplace,
            diag_terms=diag_terms)
    if isinstance(op, MultiSwapOp):
        if inplace:
            # Capacity tier: the XLA multi-axis transpose materializes
            # BOTH planes in a permuted physical layout that cannot
            # reuse the donated flat buffers (2 x 4 GiB co-live temps
            # overflowed n=30 by 261 MB even barriered).  Route each
            # SWAP through the aliased pair kernels instead — one
            # zero-temp pass per pair.
            for qa, qb in op.pairs:
                if pk.pair_update_supported(qa, qb) and min(qa, qb) >= 10:
                    re, im = pk.pair_update_planar(
                        re, im, qa, qb, dense._SWAP4,
                        interpret=interpret, inplace=True)
                elif pk.midpair_supported(qa, qb):
                    re, im = pk.midpair_planar(
                        re, im, qa, qb, dense._SWAP4,
                        interpret=interpret, inplace=True)
                else:
                    # span < 7 with min >= 7 (e.g. (8,9), (10,12)):
                    # a one-gate positioned panel covers it.
                    s = min(qa, qb)
                    w = max(qa, qb) - s + 1
                    W = dense.compose_low_panel(
                        [((qa - s, qb - s), dense._SWAP4)], w)
                    re, im = pk.positioned_panel_planar(
                        re, im, W, s, interpret=interpret, inplace=True)
                re, im = jax.lax.optimization_barrier((re, im))
            return re, im
        return apply_multiswap_planar(re, im, op.pairs)
    if isinstance(op, DiagOp):
        if op.terms is not None and re.size < 8 * 128:
            # Below the Pallas (8, 128) block minimum (tests / tiny
            # shards): exact elementwise terms evaluation, any mode.
            return dense.apply_diag_terms_planar(re, im, op.terms)
        if inplace:
            if op.terms is not None:
                # ONE aliased pass with in-kernel phase computation
                # (the XLA shear path costs 3-4 full HBM passes and
                # its layout-safe classes fragment the merge).
                return pk.fused_diag_planar(
                    re, im, op.terms, interpret=interpret, inplace=True)
            if re.size < 8 * 128:
                # Tiny shards (virtual-mesh tests): the shear's
                # (A, 8, 128) views degenerate; broadcast is exact and
                # memory is irrelevant at this size.
                return dense.apply_diag_planar(re, im, op.qubits, op.d)
            # The direct broadcast keeps 4 planes live (16 GiB at
            # n=30); the exact three-shear form peaks at 3.
            return dense.apply_diag_planar_shear(re, im, op.qubits, op.d)
        if op.d is None:
            # Terms-only merge (unbounded qubit mix): the fused kernel
            # applies the whole run in one pass at the standard tier
            # too — a capped 13-qubit broadcast run of qft26 takes ~18
            # sweeps, terms-only takes ~4.
            return pk.fused_diag_planar(re, im, op.terms,
                                        interpret=interpret)
        return dense.apply_diag_planar(re, im, op.qubits, op.d)
    if inplace and G.is_diagonal(op.U):
        # Singleton diag gates of any qubit mix: same fused kernel.
        if re.size >= 8 * 128:
            from ..circuit.panelize import diag_phase_terms

            terms = tuple(diag_phase_terms(
                op.qubits, np.diag(np.asarray(op.U))).items())
            return pk.fused_diag_planar(
                re, im, terms, interpret=interpret, inplace=True)
        # Tiny shards: broadcast (the shear's views degenerate < 8*128).
        return dense.apply_diag_planar(
            re, im, op.qubits, np.diag(np.asarray(op.U)))
    if len(op.qubits) == 2 and not G.is_diagonal(op.U):
        qa, qb = op.qubits
        is_swap = np.array_equal(
            np.asarray(op.U, np.complex128), dense._SWAP4)
        # At capacity (inplace mode) the pair kernel also takes SWAPs:
        # the XLA transpose allocates a second copy of the plane.  The
        # COLUMN pair layout (lo <= 12) is not a bitcast of the flat
        # planes, so capacity mode keeps those gates on the planar XLA
        # path (layout-safe) and only the canonical-lane row kernel
        # (lo >= 13) runs in-place.
        if (
            (not is_swap or inplace)
            and pk.pair_update_supported(qa, qb)
            and (not inplace or min(qa, qb) >= 10)
        ):
            return pk.pair_update_planar(
                re, im, qa, qb, op.U, interpret=interpret, inplace=inplace)
        if inplace and pk.midpair_supported(qa, qb):
            # (7..9, >=10) pairs: the SWAP transpose / XLA lincomb
            # views force padded layouts at capacity; the midpair
            # kernel stays a bitcast of the flat planes.
            return pk.midpair_planar(
                re, im, qa, qb, op.U, interpret=interpret, inplace=True)
        if pk.mixed_pair_supported(qa, qb):
            return pk.mixed_pair_planar(
                re, im, qa, qb, op.U, interpret=interpret, inplace=inplace)
        if pk.mixed_low_pair_supported(qa, qb) and re.size >= 8 * 128:
            # (lane, 7..9) straddler: layout-free (A, 8, 128) view with
            # the hi bit indexed in-kernel and the lane bit folded into
            # 128x128 MXU lane operators.
            return pk.mixed_low_pair_planar(
                re, im, qa, qb, op.U, interpret=interpret, inplace=inplace)
    planar = dense.apply_gate_planar(re, im, op.qubits, op.U)
    if planar is not None:
        return planar
    if inplace and re.size >= _capacity_guard_min():
        # Capacity tier (n >= 29): the complex mixed path materializes
        # a full second copy of the state (from_planar -> apply_gate ->
        # to_planar peaks at 4x plane footprint = 16 GiB at n=30) and
        # would OOM the chip.  Raised at trace time so the user gets a
        # clear error instead of an XLA allocation failure.  (Below the
        # threshold — tests, tiny shards — the fallback is memory-safe
        # and allowed; QST_CAPACITY_GUARD_MIN overrides.)
        name = getattr(op, "name", None) or f"{len(op.qubits)}q unitary"
        raise ValueError(
            f"capacity mode: gate {name} on qubits {tuple(op.qubits)} has "
            f"no in-place planar kernel (non-diagonal {len(op.qubits)}-qubit "
            f"gate straddling the lane window). Decompose it into 1q/2q "
            f"gates (e.g. CCX -> H/T/CNOT) or run below n=29 where the "
            f"complex fallback fits."
        )
    c = dense.apply_gate(pk.from_planar(re, im, dtype), op.qubits, op.U)
    return pk.to_planar(c)


def _capacity_guard_min() -> int:
    """State size (amplitudes) above which capacity mode REFUSES the
    complex fallback path instead of risking an OOM.  2^27 f32 planes
    = 1 GiB; the 4x-peak fallback is safe below that on any real chip."""
    import os as _os

    return int(_os.environ.get("QST_CAPACITY_GUARD_MIN", str(1 << 27)))


def pair_panel_diag(ops, enabled: bool | None = None):
    """Peephole over a window schedule: [(op, fused_diag_terms), ...].

    A WindowPanelOp immediately followed by a LARGE terms-only DiagOp
    becomes ONE kernel pass (the diag applies as an in-VMEM matmul
    epilogue, ``ops/diag_plan.py``) — qft26's 3 big merged diag passes
    (49-103 terms) ride their preceding panels.  SMALLER runs stay
    separate: the epilogue's cos/sin serializes with the panel's MXU
    work, and up to ~45 terms that costs more than the saved pass
    (sycamore26's 2-7-term runs: 0.0648 fused vs 0.0622 unfused;
    qaoa26's 41-45-term runs: 0.0431 vs 0.0419 — measured
    2026-08-19; capacity-tier runs are far larger and always fuse).
    ``QST_PANEL_DIAG_FUSE=0`` disables entirely;
    ``QST_PANEL_DIAG_FUSE_MIN`` tunes the threshold.
    """
    import os as _os

    from ..circuit.panelize import DiagOp, DualPanelOp, WindowPanelOp

    if enabled is None:
        enabled = _os.environ.get("QST_PANEL_DIAG_FUSE", "1") != "0"
    min_terms = int(_os.environ.get("QST_PANEL_DIAG_FUSE_MIN", "48"))
    out = []
    i = 0
    while i < len(ops):
        op = ops[i]
        nxt = ops[i + 1] if i + 1 < len(ops) else None
        if (enabled and isinstance(op, (WindowPanelOp, DualPanelOp))
                and isinstance(nxt, DiagOp) and nxt.terms is not None
                and len(nxt.terms) >= min_terms):
            out.append((op, nxt.terms))
            i += 2
        else:
            out.append((op, None))
            i += 1
    return out


def build_window_circuit_fn(
    circuit_dict: dict,
    *,
    dtype=jnp.complex64,
    window: int = 7,
    donate: bool = True,
    interpret: bool | None = None,
    inplace: bool | None = None,
    planar_io: bool = False,
):
    """jitted fn(psi)->psi in fixed-window planar-Pallas form.

    The state is split once into f32 re/im planes; every panel runs as
    a Pallas kernel (lane panel at pos 0, positioned panel at pos>=7 —
    measured 529 GB/s vs 310 GB/s for the XLA matmul path on v5e), and
    NO rotation transposes are needed.  Generic stragglers run through
    the layout-aware complex path (the complex<->planar conversion
    fuses into the surrounding program).

    ``interpret`` defaults to True off-TPU (Mosaic kernels need real
    hardware; interpret mode keeps tests runnable on CPU).

    ``inplace`` (default: n >= 29) runs the Pallas kernels with
    ``input_output_aliases`` so each pass updates the planes with ZERO
    extra HBM — at n=30 the two f32 planes are 8 GiB and a 16 GiB chip
    cannot hold a second copy.  ``planar_io=True`` makes the returned
    fn take and return ``(re, im)`` f32 planes instead of a complex
    vector — the complex<->planar conversion itself peaks at 2x state,
    so the n=30 capacity tier must stay planar end to end (the TPU
    analogue of the reference's n=30 out-of-core ceiling,
    ``wenbo_engine/docs/v3_comparison.md:45-62``).
    """
    from ..circuit.panelize import (
        PhysGateOp, WindowPanelOp, compile_window_schedule,
    )
    from ..ops import pallas_kernels as pk

    cd = validate_circuit_dict(circuit_dict)
    n = cd["number_of_qubits"]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if inplace is None:
        inplace = n >= 29
    import os as _os
    terms_only = inplace or (
        n >= 10 and _os.environ.get("QST_DIAG_TERMS_ONLY", "1") == "1")
    fuse = _os.environ.get("QST_PANEL_DIAG_FUSE", "1") != "0"
    bpd = _os.environ.get("QST_BITPERM_DECOMP", "1") != "0"
    ppf = _os.environ.get("QST_PANEL_PAIR_FUSE", "1") != "0"
    sfold = _os.environ.get("QST_STRADDLE_FOLD", "1") != "0"
    key = ("window", circuit_hash(cd), jnp.dtype(dtype).name, window,
           donate, interpret, inplace, planar_io, terms_only, fuse, bpd,
           ppf, sfold)
    cached = _COMPILE_CACHE.get(key)
    if cached is not None:
        return cached

    # Free diag merging in every mode: the capacity tier's fused diag
    # kernel computes phases from index bits in-kernel, so any-mix
    # merged runs are a single aliased pass (layout_safe_diag remains
    # for the XLA shear fallback, which tests exercise directly).  At
    # capacity the merge cap lifts entirely (terms-only DiagOps): a
    # run of 13 capped diag passes becomes ONE — qft30's 29 diag
    # sweeps collapse to 4.  The standard tier (n <= 28) lifts the cap
    # too since the small-table kernel made merged passes cost the
    # same as broadcast sweeps (QST_DIAG_TERMS_ONLY=0 reverts to the
    # capped 13-qubit broadcast merges).
    ops = compile_window_schedule(cd, window=window,
                                  diag_terms_only=terms_only)

    paired = pair_panel_diag(ops, enabled=fuse)

    def body(re, im):
        for op, dterms in paired:
            # Panels ship as baked literals: composing them in-graph
            # from per-gate constants is NOT folded by XLA and ran
            # 4.4x slower at n=28.  Literal size stays small because
            # the scheduler emits minimal-width positioned panels.
            re, im = apply_window_op(re, im, op, dtype, interpret, inplace,
                                     diag_terms=dterms)
            if jax.default_backend() == "cpu" and not inplace:
                # XLA:CPU mega-fusion recomputation blowup — see
                # apply_local_ops.
                re, im = jax.lax.optimization_barrier((re, im))
            if inplace:
                # Capacity mode: pin the schedule to one op at a time.
                # Without the barrier XLA's latency-hiding scheduler
                # overlaps independent table copies/broadcasts across
                # ops and peak liveness reached 11 planes (44 GiB) on
                # qft30 — the in-place design needs exactly 3.
                re, im = jax.lax.optimization_barrier((re, im))
        return re, im

    if planar_io:
        def fn(re, im):
            return body(re, im)
    else:
        def fn(psi):
            re, im = pk.to_planar(psi)
            re, im = body(re, im)
            return pk.from_planar(re, im, dtype)

    donate_args = ((0, 1) if planar_io else (0,)) if donate else ()
    jitted = jax.jit(fn, donate_argnums=donate_args)
    _COMPILE_CACHE[key] = jitted
    return jitted


def simulate(
    circuit_dict: dict,
    *,
    dtype=jnp.complex64,
    use_fusion: bool = True,
    panel_width: int | None = 7,
    mode: str = "fused",
    initial_state=None,
    segment_gates: int | None = None,
    donate_input: bool = False,
) -> jnp.ndarray:
    """Run a circuit on one device, return the final statevector.

    ``mode='fused'``: per-gate traced program (XLA fuses elementwise
    chains).  ``mode='panel'``: rotating-panel schedule — fewer HBM
    passes and a far smaller compiled program (the production mode for
    deep circuits).

    ``segment_gates``: compile the circuit as several smaller programs
    of at most ~``segment_gates`` gates each instead of one monolith,
    cutting at the lowest-qubit-locality boundaries
    (:func:`..circuit.dag.partition` ``strategy='locality'``).  Bounds
    per-program compile time/memory for very deep circuits — the first
    Mosaic compile of a big window program through the remote compile
    service can take tens of minutes, and segments with repeated
    structure share the persistent compile cache.  (The reference
    bounds work per execution unit the same way via its gate batcher,
    ``v2_spark/src/gate_batcher.py:40``, and v3 partition execution,
    ``v3_hisvsim_spark/src/hisvsim/partition_adapter.py:34-180``.)

    ``donate_input``: donate the caller's ``initial_state`` buffer to
    the compiled program (caller promises not to touch it afterwards).
    Donation is otherwise disabled whenever an initial state is given;
    at n>=31 c128 on the host backend the non-donated chain holds
    input + output + temps (~4 states = 128 GiB) and OOMs — donation
    halves the peak.
    """
    cd = validate_circuit_dict(circuit_dict)
    n = cd["number_of_qubits"]
    if segment_gates is not None and len(cd["gates"]) > segment_gates:
        from ..circuit.dag import partition

        n_seg = -(-len(cd["gates"]) // segment_gates)
        parts = partition(cd, n_seg, strategy="locality")
        psi = (dense.zero_state(n, dtype) if initial_state is None
               else jnp.asarray(initial_state, dtype=dtype))
        first = True
        for part in parts:
            if not part:
                continue
            sub = {"number_of_qubits": n,
                   "gates": [cd["gates"][i] for i in part]}
            # psi is rebound each iteration, so every segment after the
            # first may donate its input; the first donates only with
            # the caller's permission.
            psi = simulate(sub, dtype=dtype, use_fusion=use_fusion,
                           panel_width=panel_width, mode=mode,
                           initial_state=psi,
                           donate_input=(donate_input or not first
                                         or initial_state is None))
            first = False
        return psi
    if mode == "auto":
        # Window mode wins when most gates pack into panels (measured
        # 358x vs 267x vs ~unusable per-gate unroll at n=28); fall back
        # to the per-gate fused trace for shallow or panel-hostile
        # circuits where trace simplicity beats pass count.
        from ..circuit.panelize import window_stats

        st = window_stats(cd)
        dense_enough = st["hbm_passes"] <= max(4, len(cd["gates"]) // 2)
        mode = "window" if (n >= 14 and dense_enough) else "fused"
    donate = initial_state is None or donate_input
    if mode == "panel":
        fn = build_panel_circuit_fn(
            cd, dtype=dtype, donate=donate,
        )
    elif mode == "window":
        fn = build_window_circuit_fn(
            cd, dtype=dtype, donate=donate,
        )
    else:
        fn = build_circuit_fn(
            cd, dtype=dtype, use_fusion=use_fusion, panel_width=panel_width,
            donate=donate,
        )
    if initial_state is None:
        psi = dense.zero_state(n, dtype)
    else:
        psi = jnp.asarray(initial_state, dtype=dtype)
    return fn(psi)


def simulate_np(circuit_dict: dict, **kw) -> np.ndarray:
    """Like :func:`simulate` but returns host numpy (test convenience)."""
    return np.asarray(simulate(circuit_dict, **kw))
