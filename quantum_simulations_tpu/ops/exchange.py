"""Cross-shard gate application — the ICI communication tier.

The global 2^n statevector is sharded over a 1-D device mesh: device
bits are the TOP index bits (qubits k..n-1 for shard width 2^k), so
qubit q >= k lives on mesh-axis bit (q - k).  A gate touching such a
qubit pairs amplitudes on different chips.

One general mechanism replaces the reference's four butterfly cases
(``wenbo_engine/kernel/cpu_nonlocal.py``), its MPI bit-permutation
all-to-all (``hisvsim_repo/mpi_redistributer.hpp``), and its
"insular"-gate scheduling relaxation (``wenbo_engine/circuit/staging.py:65-98``):

For a gate on qubits Q = (device bits D, local bits L), decompose the
update by **XOR offset** x over the device bits:

    new_shard = sum_x  W_x  applied-to  ppermute(shard, pairing: s <-> s^x)

where W_x is the 2^|L| x 2^|L| block of U coupling my device-bit values
``a`` to partner values ``a ^ x``.  Offsets whose block is structurally
zero for every ``a`` are **elided at trace time** — so:

* diagonal gates (Z/S/T/R/CZ/CR/RZZ) keep only x = 0: zero traffic;
* CNOT/CU with control on a device bit keeps only the offset that
  leaves the control untouched: a control on a device bit costs zero
  traffic if the target is local, and ONE exchange (not three) if the
  target is remote;
* a general 1q gate costs exactly one ppermute (the butterfly);
* SWAP across the shard boundary costs one ppermute of half the data
  volume in matrix form (two surviving offsets, but x=0 is diagonal).

W_x depends on this device's own bit values (a traced scalar from
``axis_index``), so blocks are gathered from the constant U in-graph;
the collective *pattern* is identical on every device, as SPMD needs.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import dense


def _device_bit(axis_name: str, bit: int) -> jnp.ndarray:
    """This device's value of mesh-axis bit `bit` (traced 0/1 scalar)."""
    return (lax.axis_index(axis_name) >> bit) & 1


def _xor_perm(n_dev: int, mask: int) -> list[tuple[int, int]]:
    return [(i, i ^ mask) for i in range(n_dev)]


def nonzero_offsets(U: np.ndarray, qubits: tuple[int, ...], k: int) -> list[int]:
    """Which XOR offsets over the device-bit qubits have nonzero blocks."""
    m = len(qubits)
    dev_pos = [j for j, q in enumerate(qubits) if q >= k]
    loc_pos = [j for j, q in enumerate(qubits) if q < k]
    r, p = len(dev_pos), len(loc_pos)

    def sub_index(dev_bits: int, loc_sub: int) -> int:
        s = 0
        for t, j in enumerate(dev_pos):
            s |= ((dev_bits >> (r - 1 - t)) & 1) << (m - 1 - j)
        for t, j in enumerate(loc_pos):
            s |= ((loc_sub >> (p - 1 - t)) & 1) << (m - 1 - j)
        return s

    out = []
    for x in range(1 << r):
        nz = False
        for a in range(1 << r):
            for lo in range(1 << p):
                for li in range(1 << p):
                    if U[sub_index(a, lo), sub_index(a ^ x, li)] != 0:
                        nz = True
                        break
                if nz:
                    break
            if nz:
                break
        if nz:
            out.append(x)
    return out


def apply_nonlocal(
    shard: jnp.ndarray,
    axis_name: str,
    k: int,
    qubits: tuple[int, ...],
    U: np.ndarray,
) -> jnp.ndarray:
    """Apply a gate with >=1 device-bit qubit to this device's shard.

    Must run inside ``shard_map`` over a 1-D mesh axis ``axis_name`` of
    2^(n-k) devices; ``shard`` is the flat (2^k,) local block.
    """
    U = np.asarray(U, dtype=np.complex128)
    m = len(qubits)
    dev_pos = [j for j, q in enumerate(qubits) if q >= k]
    loc_pos = [j for j, q in enumerate(qubits) if q < k]
    r, p = len(dev_pos), len(loc_pos)
    assert r >= 1, "apply_nonlocal called with an all-local gate"
    n_dev = lax.axis_size(axis_name)
    loc_qubits = tuple(qubits[j] for j in loc_pos)

    # My device-bit values (traced scalars, one per device-bit qubit).
    myvals = [_device_bit(axis_name, qubits[j] - k) for j in dev_pos]

    # Gate-subspace bit weights.
    dev_weight = [1 << (m - 1 - j) for j in dev_pos]
    loc_out_offsets = np.zeros(1 << p, dtype=np.int32)
    for lo in range(1 << p):
        s = 0
        for t, j in enumerate(loc_pos):
            s |= ((lo >> (p - 1 - t)) & 1) << (m - 1 - j)
        loc_out_offsets[lo] = s
    loc_in_offsets = loc_out_offsets  # same layout for input subindex

    offsets = nonzero_offsets(U, qubits, k)
    u_const = jnp.asarray(U.astype(dense._np_dtype(shard.dtype)))

    def block_for(x: int):
        """W_x as a traced (2^p, 2^p) matrix (gathered from constant U)."""
        base_out = sum(
            (mv * w for mv, w in zip(myvals, dev_weight)),
            start=jnp.int32(0),
        )
        base_in = sum(
            (
                (mv ^ ((x >> (r - 1 - t)) & 1)) * dev_weight[t]
                for t, mv in enumerate(myvals)
            ),
            start=jnp.int32(0),
        )
        rows = base_out + jnp.asarray(loc_out_offsets)
        cols = base_in + jnp.asarray(loc_in_offsets)
        return u_const[rows[:, None], cols[None, :]]

    def mesh_mask(x: int) -> int:
        mm = 0
        for t, j in enumerate(dev_pos):
            if (x >> (r - 1 - t)) & 1:
                mm |= 1 << (qubits[j] - k)
        return mm

    def _single_cell_tables(x: int):
        """Per-device-value single-cell structure of offset x's block.

        Returns ``(lo_table, li_table)`` (np arrays over the 2^r
        device-bit values) if for EVERY device value the block has
        exactly one nonzero cell — the cell may differ per device
        (e.g. SWAP across the boundary: device a reads plane 1-a).
        The exchanged data then shrinks to the active local plane —
        half the ICI traffic — with the plane index a traced lookup.
        """
        if p != 1:
            return None
        lo_t = np.zeros(1 << r, dtype=np.int32)
        li_t = np.zeros(1 << r, dtype=np.int32)
        for a in range(1 << r):
            ro_base = sum(
                ((a >> (r - 1 - t)) & 1) * dev_weight[t] for t in range(r)
            )
            ci_base = sum(
                (((a >> (r - 1 - t)) & 1) ^ ((x >> (r - 1 - t)) & 1))
                * dev_weight[t]
                for t in range(r)
            )
            cells = [
                (lo, li)
                for lo in range(2)
                for li in range(2)
                if U[ro_base + int(loc_out_offsets[lo]),
                     ci_base + int(loc_in_offsets[li])] != 0
            ]
            if len(cells) != 1:
                return None
            lo_t[a], li_t[a] = cells[0]
        return lo_t, li_t

    # Traced device value in the same bit order the tables use.
    if r:
        a_scalar = sum(
            (mv * (1 << (r - 1 - t)) for t, mv in enumerate(myvals)),
            start=jnp.int32(0),
        )

    acc = None
    for x in offsets:
        tables = _single_cell_tables(x) if x != 0 else None
        if x == 0:
            data = shard
        elif tables is not None:
            lo_t, li_t = tables
            lout = jnp.take(jnp.asarray(lo_t), a_scalar)
            # Plane I read from the received data: li_t[my value].
            lin = jnp.take(jnp.asarray(li_t), a_scalar)
            # Plane I must SEND: what my PARTNER (value = mine ^ x)
            # reads, li_t[a ^ x].  For symmetric tables (CNOT) the two
            # coincide; for asymmetric ones (SWAP: device a reads the
            # 1-a plane) sending li_t[self] ships the wrong half —
            # caught by the cross-boundary fuzz in tests/test_reshard.py.
            lin_send = jnp.take(jnp.asarray(li_t), a_scalar ^ x)
            q = loc_qubits[0]
            C = 1 << q
            R = shard.size >> (q + 1)
            planes = shard.reshape(R, 2, C)
            half = lax.dynamic_slice_in_dim(planes, lin_send, 1, axis=1)
            recv = lax.ppermute(half, axis_name, _xor_perm(n_dev, mesh_mask(x)))
            W = block_for(x)
            contrib_half = W[lout, lin] * recv
            contrib = lax.dynamic_update_slice_in_dim(
                jnp.zeros_like(planes), contrib_half, lout, axis=1,
            ).reshape(shard.size)
            acc = contrib if acc is None else acc + contrib
            continue
        else:
            data = lax.ppermute(shard, axis_name, _xor_perm(n_dev, mesh_mask(x)))
        W = block_for(x)
        if p == 0:
            contrib = W[0, 0] * data
        else:
            contrib = dense.apply_gate(data, loc_qubits, W)
        acc = contrib if acc is None else acc + contrib
    return acc


def zero_offset_block(U: np.ndarray, qubits: tuple[int, ...], k: int,
                      a: int) -> np.ndarray:
    """W_0 for device-bit value pattern ``a``: the (2^p, 2^p) block of
    U coupling local sub-indices when every device-bit qubit keeps its
    value.  For a zero-traffic gate (only offset x=0 nonzero — device
    bits insular) this IS the whole local update for a device whose
    bit pattern is ``a`` (bit t of ``a`` = value of ``dev_pos[t]``,
    most significant first — matching ``apply_nonlocal``'s tables).
    """
    U = np.asarray(U, dtype=np.complex128)
    m = len(qubits)
    dev_pos = [j for j, q in enumerate(qubits) if q >= k]
    loc_pos = [j for j, q in enumerate(qubits) if q < k]
    r, p = len(dev_pos), len(loc_pos)
    base = sum(((a >> (r - 1 - t)) & 1) << (m - 1 - j)
               for t, j in enumerate(dev_pos))
    off = [sum(((lo >> (p - 1 - t)) & 1) << (m - 1 - j)
               for t, j in enumerate(loc_pos)) for lo in range(1 << p)]
    idx = np.asarray([base + o for o in off])
    return U[np.ix_(idx, idx)]


# ---------------------------------------------------------------------------
# Traffic accounting (scheduler cost model / stats)
# ---------------------------------------------------------------------------

def exchange_cost(U: np.ndarray, qubits: tuple[int, ...], k: int) -> int:
    """Number of ppermute rounds this gate costs at shard width 2^k."""
    if all(q < k for q in qubits):
        return 0
    return sum(1 for x in nonzero_offsets(np.asarray(U), tuple(qubits), k) if x != 0)


def offset_traffic(U: np.ndarray, qubits: tuple[int, ...], k: int) -> list[tuple[int, float]]:
    """Per-nonzero-offset shipped volume, as a fraction of the shard.

    Mirrors :func:`apply_nonlocal`'s dispatch: an offset whose block
    has a single nonzero cell per device value ships only the active
    local plane (fraction 0.5); others ship the full shard (1.0).
    """
    U = np.asarray(U, dtype=np.complex128)
    m = len(qubits)
    dev_pos = [j for j, q in enumerate(qubits) if q >= k]
    loc_pos = [j for j, q in enumerate(qubits) if q < k]
    r, p = len(dev_pos), len(loc_pos)
    if r == 0:
        return []
    dev_weight = [1 << (m - 1 - j) for j in dev_pos]
    loc_off = [
        sum(((lo >> (p - 1 - t)) & 1) << (m - 1 - j)
            for t, j in enumerate(loc_pos))
        for lo in range(1 << p)
    ]

    out = []
    for x in nonzero_offsets(U, tuple(qubits), k):
        if x == 0:
            continue
        frac = 1.0
        if p == 1:
            single = True
            for a in range(1 << r):
                ro = sum(((a >> (r - 1 - t)) & 1) * dev_weight[t]
                         for t in range(r))
                ci = sum((((a >> (r - 1 - t)) & 1) ^ ((x >> (r - 1 - t)) & 1))
                         * dev_weight[t] for t in range(r))
                cells = sum(
                    1 for lo in range(2) for li in range(2)
                    if U[ro + loc_off[lo], ci + loc_off[li]] != 0
                )
                if cells != 1:
                    single = False
                    break
            if single:
                frac = 0.5
        out.append((x, frac))
    return out


def exchange_bytes(U: np.ndarray, qubits: tuple[int, ...], k: int,
                   itemsize: int = 8) -> int:
    """ICI bytes shipped per device for this gate at shard width 2^k."""
    shard_bytes = (1 << k) * itemsize
    return int(sum(frac * shard_bytes
                   for _, frac in offset_traffic(U, qubits, k)))


def weighted_exchange_bytes(
    U: np.ndarray, qubits: tuple[int, ...], k: int,
    bit_costs: list[float], itemsize: int = 8,
) -> float:
    """Link-cost-weighted bytes per device for this gate.

    ``bit_costs[b]`` is the per-byte cost of an exchange that flips
    device bit b (``parallel.distributed.device_bit_costs``: ICI=1,
    DCN~20 on a host-contiguous pod mesh).  A ppermute by XOR offset
    crosses the most expensive link among its flipped device bits —
    the mesh-aware cost the staging scheduler minimizes, replacing
    round counts (reference analogue: the byte accounting of
    ``hisvsim_repo/mpi_redistributer.hpp``'s plan selection).
    """
    m = len(qubits)
    dev_pos = [j for j, q in enumerate(qubits) if q >= k]
    r = len(dev_pos)
    shard_bytes = (1 << k) * itemsize
    total = 0.0
    for x, frac in offset_traffic(U, qubits, k):
        # Map the gate-subspace offset back to device-index bits.
        mask = 0
        for t, j in enumerate(dev_pos):
            if (x >> (r - 1 - t)) & 1:
                mask |= 1 << (qubits[j] - k)
        w = max(
            (bit_costs[b] for b in range(len(bit_costs)) if (mask >> b) & 1),
            default=1.0,
        )
        total += w * frac * shard_bytes
    return total
