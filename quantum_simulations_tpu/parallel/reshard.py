"""Bit-permutation resharding — the all-to-all qubit-redistribution tier.

The reference redistributes amplitudes between ranks when the staging
scheduler changes which index bits are "proc bits": a per-rank
communication plan of strided subarray sends executed with nonblocking
MPI (``hisvsim_repo/mpi_redistributer.hpp:39-340``, driven by
``svsim-mpi.hpp:123-173``'s ``gather_qubits``).

TPU-native equivalent: ONE ``lax.all_to_all`` collective per stage
transition.  Swapping local bits L = (l_0..l_{r-1}) with device bits
D = (d_0..d_{r-1}) is, semantically, the gate sequence
``SWAP(l_0, d_0) ... SWAP(l_{r-1}, d_{r-1})`` — but instead of r
full-shard ``ppermute`` rounds it moves every amplitude once:

* view the (2^k,) shard as (2^r, 2^(k-r)) with the L bits as the
  leading axis (a local transpose XLA lays out for the collective);
* ``all_to_all`` over the 2^r-device subgroup that varies exactly in
  the D bits: chunk j of device s goes to the group member whose
  D-bits equal j, and lands at leading position s_D — precisely the
  SWAP-set permutation;
* transpose back.

Traffic: each device ships 2^k * (1 - 2^-r) amplitudes once, versus
r * 2^k for the SWAP-by-SWAP ppermute chain — r times less for the
full-boundary reshard staging emits.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def _axis_groups(n_dev: int, dev_bits: list[int]) -> list[list[int]]:
    """Subgroups of the 1-D mesh varying exactly in ``dev_bits``.

    Group member j (leading-axis chunk j) is the device whose
    ``dev_bits`` pattern encodes j with bit i of j on mesh-axis bit
    ``dev_bits[i]``; all other bits identify the group.
    """
    r = len(dev_bits)
    rest_mask = (n_dev - 1) & ~sum(1 << b for b in dev_bits)
    groups = []
    seen = set()
    for base in range(n_dev):
        key = base & rest_mask
        if key in seen:
            continue
        seen.add(key)
        members = []
        for j in range(1 << r):
            s = key
            for i, b in enumerate(dev_bits):
                if (j >> i) & 1:
                    s |= 1 << b
            members.append(s)
        groups.append(members)
    return groups


def swap_device_bits(
    shard: jnp.ndarray,
    axis_name: str,
    k: int,
    pairs: list[tuple[int, int]],
) -> jnp.ndarray:
    """Exchange local bits with device bits in one all_to_all.

    ``pairs`` is a list of (local_qubit, device_qubit) with
    local_qubit < k <= device_qubit, all locals distinct, all device
    qubits distinct.  Semantically identical to applying
    ``SWAP(lq, dq)`` for every pair; must run inside ``shard_map``.
    """
    if not pairs:
        return shard
    lqs = [p[0] for p in pairs]
    dqs = [p[1] for p in pairs]
    r = len(pairs)
    assert len(set(lqs)) == r and len(set(dqs)) == r, "pairs must be disjoint"
    assert all(lq < k <= dq for lq, dq in pairs)
    n_dev = lax.axis_size(axis_name)

    # Leading axis value j: bit i of j = local bit lqs[i].
    # Tensor axes (C order): axis a carries bit (k-1-a).
    front = [k - 1 - lqs[i] for i in range(r - 1, -1, -1)]
    rest = [a for a in range(k) if a not in front]
    x = shard.reshape((2,) * k).transpose(front + rest)
    x = x.reshape(1 << r, 1 << (k - r))

    groups = _axis_groups(n_dev, [dq - k for dq in dqs])
    y = lax.all_to_all(x, axis_name, split_axis=0, concat_axis=0,
                       axis_index_groups=groups)

    # Invert the local transpose.
    y = y.reshape((2,) * k)
    inv = np.argsort(front + rest)
    return y.transpose(list(inv)).reshape(shard.size)


def plan_boundary_reshard(
    ops: list, k: int,
) -> tuple[list[tuple[int, int]], list]:
    """Split a step's nonlocal ops into (reshard pairs, remaining ops).

    Staging emits stage transitions as runs of boundary SWAPs (one
    local qubit, one device qubit, pairwise disjoint); they collapse
    into one reshard collective, everything else stays on the per-gate
    exchange path.  A SWAP is hoisted to the front only when it shares
    no qubit with any earlier non-hoisted op (always true inside one
    level, where gates are mutually disjoint), so reordering is safe.
    """
    pairs: list[tuple[int, int]] = []
    used: set[int] = set()
    rest: list = []
    seen_qubits: set[int] = set()
    for op in ops:
        name = getattr(op, "name", None)
        qs = tuple(op.qubits)
        if (
            name == "SWAP"
            and len(qs) == 2
            and min(qs) < k <= max(qs)
            and not (set(qs) & used)
            and not (set(qs) & seen_qubits)
        ):
            pairs.append((min(qs), max(qs)))
            used.update(qs)
        else:
            rest.append(op)
            seen_qubits.update(qs)
    return pairs, rest


def reshard_bytes(k: int, r: int, itemsize: int = 8) -> dict:
    """ICI traffic of one reshard vs the equivalent SWAP ppermute chain."""
    shard = (1 << k) * itemsize
    return {
        "all_to_all_bytes": shard - (shard >> r),
        "ppermute_chain_bytes": r * shard,
    }
