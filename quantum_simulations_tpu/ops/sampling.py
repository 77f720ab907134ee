"""Measurement, sampling, projection, expectation values.

Capability parity with the reference's C++ StateVector measurement API
(``hisvsim_repo/state_vector.hpp``: ``probability``, ``project``,
``measure``) plus the random-circuit-sampling path the BASELINE
targets.  Everything is jnp on the (possibly sharded) global state —
reductions lower to ``psum`` over the mesh automatically under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def probabilities(psi: jax.Array) -> jax.Array:
    return jnp.real(psi) ** 2 + jnp.imag(psi) ** 2


def norm(psi: jax.Array) -> jax.Array:
    return jnp.sqrt(jnp.sum(probabilities(psi)))


def normalize(psi: jax.Array) -> jax.Array:
    return psi / norm(psi).astype(psi.dtype)


def _parity_fold(bits: jnp.ndarray) -> jnp.ndarray:
    """Popcount parity of each element via xor-fold (uint32 or uint64)."""
    if bits.dtype == jnp.uint64:
        bits = bits ^ (bits >> 32)
    bits = bits ^ (bits >> 16)
    bits = bits ^ (bits >> 8)
    bits = bits ^ (bits >> 4)
    bits = bits ^ (bits >> 2)
    bits = bits ^ (bits >> 1)
    return (bits & 1).astype(jnp.int32)


def _bit_parity(n_amps: int, mask: int) -> jnp.ndarray:
    idx = jnp.arange(n_amps, dtype=jnp.uint32 if n_amps <= (1 << 31) else jnp.uint64)
    return _parity_fold(idx & jnp.asarray(mask, dtype=idx.dtype))


def expectation_z(psi: jax.Array, qubits: list[int]) -> jax.Array:
    """<Z_{q1} Z_{q2} ...> — diagonal Pauli-string expectation."""
    mask = 0
    for q in qubits:
        mask |= 1 << q
    parity = _bit_parity(psi.size, mask)
    signs = 1.0 - 2.0 * parity.astype(jnp.float32)
    return jnp.sum(probabilities(psi) * signs)


def qubit_probability(psi: jax.Array, q: int) -> jax.Array:
    """P(qubit q = 1)."""
    n = int(np.log2(psi.size))
    x = probabilities(psi).reshape(1 << (n - q - 1), 2, 1 << q)
    return jnp.sum(x[:, 1, :])


def project(psi: jax.Array, q: int, value: int, *, renormalize: bool = True) -> jax.Array:
    """Project qubit q onto |value> (and renormalize by default)."""
    n = int(np.log2(psi.size))
    x = psi.reshape(1 << (n - q - 1), 2, 1 << q)
    keep = x[:, value, :]
    zero = jnp.zeros_like(keep)
    pair = (keep, zero) if value == 0 else (zero, keep)
    out = jnp.stack(pair, axis=1).reshape(psi.size)
    if renormalize:
        out = normalize(out)
    return out


def measure_qubit(psi: jax.Array, q: int, key: jax.Array):
    """Sample qubit q; returns (outcome, collapsed_state)."""
    p1 = qubit_probability(psi, q)
    outcome = jax.random.bernoulli(key, p1).astype(jnp.int32)
    collapsed = jax.lax.cond(
        outcome == 1,
        lambda s: project(s, q, 1),
        lambda s: project(s, q, 0),
        psi,
    )
    return outcome, collapsed


def sample(psi: jax.Array, key: jax.Array, shots: int) -> jax.Array:
    """Draw bitstring samples (as integer indices) from |psi|^2.

    Small states use Gumbel-max (``jax.random.categorical``); larger
    ones route through the hierarchical inverse-CDF sampler (the
    categorical would materialize (shots, 2^n) Gumbel noise — see
    :func:`sample_bits_planar`).

    The hierarchical path composes indices as ``blocks * 2^lb +
    local``; without x64 that arithmetic is int32, so n is capped at
    31 there (with ``jax_enable_x64`` it upcasts to int64 and the cap
    lifts).  Beyond that, sample per-qubit bits via
    :func:`sample_bits` / ``sample_bits_planar`` instead.
    """
    if psi.size <= (1 << 16) or shots * psi.size <= (1 << 24):
        logp = jnp.log(probabilities(psi) + 1e-38)
        return jax.random.categorical(key, logp, shape=(shots,))
    n = int(np.log2(psi.size))
    x64 = jax.config.read("jax_enable_x64")
    if n > 31 and not x64:
        raise ValueError(
            f"sample(): n={n} > 31 would overflow the int32 index "
            "composition; enable jax_enable_x64 or use sample_bits()")
    blocks, local, lb = _hier_sample(
        jnp.real(psi), jnp.imag(psi), key, shots, n)
    idt = jnp.int64 if x64 else jnp.int32
    return blocks.astype(idt) * (1 << lb) + local.astype(idt)


def sample_bits(psi: jax.Array, key: jax.Array, shots: int, n: int) -> jax.Array:
    """Samples as a (shots, n) bit matrix (little-endian: column q = qubit q)."""
    idx = sample(psi, key, shots)
    qs = jnp.arange(n, dtype=idx.dtype)
    return ((idx[:, None] >> qs[None, :]) & 1).astype(jnp.int8)


def fidelity(a: jax.Array, b: jax.Array) -> jax.Array:
    """|<a|b>| — phase-invariant overlap."""
    return jnp.abs(jnp.vdot(a, b))


# ---------------------------------------------------------------------------
# Planar readout (capacity tier): the state exists only as f32 planes
# ---------------------------------------------------------------------------
#
# At n >= 29 single-chip the state is (re, im) f32 planes and a complex
# copy cannot exist (runtime/simulator.build_window_circuit_fn
# planar_io).  Every readout here reads the planes through FUSED
# reductions — XLA folds the re*re+im*im producer into the reduce, so
# the full probability vector is never materialized (a 2^30 f32 p
# vector alone would be 4 GiB).  Reference measurement parity:
# ``hisvsim_repo/state_vector.hpp:829-1003``.

def _block_bits(n: int, floor: int = 3, cap: int = 15) -> int:
    """Block width for hierarchical planar readout: ~sqrt(N), <= 2^15
    (keeps per-shot gathered rows small), >= 2^3 (clamped to n)."""
    return min(n, max(floor, min(cap, n // 2)))


def norm2_planar(re: jax.Array, im: jax.Array) -> jax.Array:
    return jnp.sum(re * re) + jnp.sum(im * im)


def expectation_z_planar(re: jax.Array, im: jax.Array,
                         qubits: list[int]) -> jax.Array:
    """<Z...Z> on f32 planes — one fused sign-weighted reduction."""
    mask = 0
    for q in qubits:
        mask |= 1 << q
    parity = _bit_parity(re.size, mask)
    signs = 1.0 - 2.0 * parity.astype(re.dtype)
    return jnp.sum((re * re + im * im) * signs)


def qubit_probability_planar(re: jax.Array, im: jax.Array, q: int) -> jax.Array:
    """P(qubit q = 1) from f32 planes (fused strided reduction)."""
    n = int(np.log2(re.size))
    shape = (1 << (n - q - 1), 2, 1 << q)
    p = (re * re + im * im).reshape(shape)
    return jnp.sum(p[:, 1, :])


def top_amplitudes_planar(re: jax.Array, im: jax.Array, k: int = 8):
    """Global top-k |amplitude|^2 indices + complex values, hierarchical.

    Two-level top-k: per-block maxima (one fused pass over the planes,
    only the (B,) maxima materialize), take the top-k blocks, then
    top-k within those blocks and reduce the k*k candidates.  Exact:
    any global top-k item is top-k within its own block, and its block
    is among the top-k blocks by max (otherwise k larger items exist).
    Returns (idx[int], probs, amp_re, amp_im) as (k,) arrays.
    """
    n = int(np.log2(re.size))
    lb = _block_bits(n)
    L = 1 << lb
    B = re.size >> lb
    kb = min(k, B)
    kl = min(k, L)

    bm = jnp.max((re * re + im * im).reshape(B, L), axis=1)
    _, blocks = jax.lax.top_k(bm, kb)
    rr = re.reshape(B, L)[blocks]
    ri = im.reshape(B, L)[blocks]
    pr = rr * rr + ri * ri                      # (kb, L) — small
    vals, loc = jax.lax.top_k(pr, kl)           # per-block top-k
    # Indices stay int32: n <= 31 single-chip (the sharded tier reads
    # out per shard, where local indices are always < 2^31).
    cand_idx = blocks[:, None] * L + loc        # (kb, kl)
    topv, sel = jax.lax.top_k(vals.reshape(-1), k)
    idx = cand_idx.reshape(-1)[sel]
    row = sel // kl
    col = loc.reshape(-1)[sel]
    amp_re = rr[row, col]
    amp_im = ri[row, col]
    return idx, topv, amp_re, amp_im


def _chunked_invcdf(cdf: jax.Array, prob_rows, u_b: jax.Array,
                    u_l: jax.Array, shots: int, L: int, B: int,
                    chunk: int = 512):
    """Exact two-level inverse-CDF draw with a bounded working set.

    ``cdf`` is the (B,) cumulative block-mass vector; ``prob_rows(blk)``
    returns the (chunk, L) probability rows for a chunk of block picks.
    Shots are processed in ``lax.map`` chunks so the peak gathered
    footprint is (chunk, L), independent of the shot count — unlike a
    Gumbel-max categorical, which materializes (shots, B) noise (at
    2^15 blocks and 10^6 shots that is >100 GB).  Returns per-shot
    (block, offset) int32 arrays.
    """
    chunk = min(chunk, shots)
    pad = (-shots) % chunk
    ub = jnp.pad(u_b, (0, pad))
    ul = jnp.pad(u_l, (0, pad))
    nb = (shots + pad) // chunk

    def pick(args):
        ub_c, ul_c = args
        blk = jnp.clip(jnp.searchsorted(cdf, ub_c, side="right"),
                       0, B - 1).astype(jnp.int32)
        p = prob_rows(blk)
        c = jnp.cumsum(p, axis=1)
        tgt = ul_c[:, None].astype(c.dtype) * c[:, -1:]
        loc = jnp.sum((c < tgt).astype(jnp.int32), axis=1)
        return blk, jnp.clip(loc, 0, L - 1)

    blks, locs = jax.lax.map(
        pick, (ub.reshape(nb, chunk), ul.reshape(nb, chunk)))
    return blks.reshape(-1)[:shots], locs.reshape(-1)[:shots]


def _hier_sample(re: jax.Array, im: jax.Array, key: jax.Array,
                 shots: int, n: int):
    """Hierarchical exact sampler over (re, im) planes.

    Level 1: block masses (one fused pass; only (B,) materializes) and
    an inverse-CDF block pick per shot.  Level 2: chunked within-block
    inverse-CDF on the gathered rows.  Both levels use the exact
    cumulative distribution, so this samples |psi|^2 exactly (up to f32
    mass rounding) with O(B + chunk*L) memory.  Returns
    (blocks, offsets, block_bits).
    """
    lb = _block_bits(n)
    L = 1 << lb
    B = re.size >> lb
    rr = re.reshape(B, L)
    ri = im.reshape(B, L)
    s = jnp.sum(rr * rr + ri * ri, axis=1)
    cdf = jnp.cumsum(s)
    key_b, key_l = jax.random.split(key)
    u_b = jax.random.uniform(key_b, (shots,), dtype=cdf.dtype) * cdf[-1]
    u_l = jax.random.uniform(key_l, (shots,), dtype=cdf.dtype)

    def prob_rows(blk):
        r = rr[blk]
        i = ri[blk]
        return r * r + i * i

    blocks, local, = _chunked_invcdf(cdf, prob_rows, u_b, u_l, shots, L, B)
    return blocks, local, lb


def sample_bits_planar(re: jax.Array, im: jax.Array, key: jax.Array,
                       shots: int, n: int) -> jax.Array:
    """Bitstring samples from f32 planes — hierarchical inverse-CDF.

    Exact sampling of |psi|^2 with no 2^n probability or log-prob
    vector and no (shots, B) noise tensor ever built (the complex-path
    categorical's 4 GiB logp at n=30 doesn't fit next to the planes;
    Gumbel noise at bench shot counts wouldn't fit anywhere) — see
    :func:`_hier_sample`.  Returns (shots, n) int8, column q = qubit q.
    """
    blocks, local, lb = _hier_sample(re, im, key, shots, n)
    qs_lo = jnp.arange(lb, dtype=jnp.int32)
    lo_bits = ((local[:, None] >> qs_lo[None, :]) & 1).astype(jnp.int8)
    qs_hi = jnp.arange(n - lb, dtype=blocks.dtype)
    hi_bits = ((blocks[:, None] >> qs_hi[None, :]) & 1).astype(jnp.int8)
    return jnp.concatenate([lo_bits, hi_bits], axis=1)


def _shard_ctx(mesh, n):
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import AXIS, shard_width

    k = shard_width(mesh, n)
    return AXIS, k, P


def expectation_z_sharded(psi: jax.Array, qubits: list[int], n: int,
                          mesh) -> jax.Array:
    """<Z...Z> on a MESH-SHARDED state — per-shard partial sums + psum.

    Device bits (qubits >= k) contribute a constant sign per shard
    (parity of the shard index against the high half of the mask);
    local bits reduce within the shard.  No gather of the 2^n vector.
    """
    from jax import lax, shard_map

    AXIS, k, P = _shard_ctx(mesh, n)
    lo_mask = 0
    hi_mask = 0
    for q in qubits:
        if q < k:
            lo_mask |= 1 << q
        else:
            hi_mask |= 1 << (q - k)

    def body(shard):
        shard = shard.reshape(-1)
        signs = 1.0 - 2.0 * _bit_parity(shard.size, lo_mask).astype(
            jnp.float32)
        part = jnp.sum(probabilities(shard) * signs)
        if hi_mask:
            i = lax.axis_index(AXIS).astype(jnp.uint32)
            hi_par = _parity_fold(i & jnp.uint32(hi_mask)).astype(jnp.float32)
            part = part * (1.0 - 2.0 * hi_par)
        return lax.psum(part, AXIS)

    return jax.jit(shard_map(
        body, mesh=mesh, in_specs=P(AXIS), out_specs=P(),
        check_vma=False))(psi)


def qubit_probability_sharded(psi: jax.Array, q: int, n: int,
                              mesh) -> jax.Array:
    """P(qubit q = 1) on a mesh-sharded state (psum reduction)."""
    from jax import lax, shard_map

    AXIS, k, P = _shard_ctx(mesh, n)

    def body(shard):
        shard = shard.reshape(-1)
        p = probabilities(shard)
        if q < k:
            part = jnp.sum(
                p.reshape(1 << (k - q - 1), 2, 1 << q)[:, 1, :])
        else:
            i = lax.axis_index(AXIS)
            mine = ((i >> (q - k)) & 1).astype(jnp.float32)
            part = jnp.sum(p) * mine
        return lax.psum(part, AXIS)

    return jax.jit(shard_map(
        body, mesh=mesh, in_specs=P(AXIS), out_specs=P(),
        check_vma=False))(psi)


def project_sharded(psi: jax.Array, q: int, value: int, n: int, mesh,
                    *, renormalize: bool = True) -> jax.Array:
    """Collapse qubit q onto |value> on the mesh (stays sharded).

    Local qubits zero the discarded half inside each shard; DEVICE
    qubits zero whole shards (the cross-shard analogue of the
    reference's strided project, ``state_vector.hpp:829-897``).
    """
    from jax import lax, shard_map

    AXIS, k, P = _shard_ctx(mesh, n)

    def body(shard):
        shard = shard.reshape(-1)
        if q < k:
            x = shard.reshape(1 << (k - q - 1), 2, 1 << q)
            keepmask = jnp.zeros((1, 2, 1), shard.dtype).at[0, value, 0].set(1)
            out = (x * keepmask).reshape(shard.size)
        else:
            i = lax.axis_index(AXIS)
            mine = (((i >> (q - k)) & 1) == value)
            out = jnp.where(mine, shard, jnp.zeros_like(shard))
        if renormalize:
            n2 = lax.psum(jnp.sum(probabilities(out)), AXIS)
            out = out / jnp.sqrt(n2).astype(out.dtype)
        return out

    return jax.jit(shard_map(
        body, mesh=mesh, in_specs=P(AXIS), out_specs=P(AXIS),
        check_vma=False))(psi)


def measure_qubit_sharded(psi: jax.Array, q: int, key: jax.Array, n: int,
                          mesh):
    """Projective measurement on the mesh; (outcome, collapsed state).

    Every device draws from the SAME key, so the outcome is identical
    across shards without a broadcast.
    """
    p1 = qubit_probability_sharded(psi, q, n, mesh)
    outcome = int(jax.random.bernoulli(key, float(p1)))
    return outcome, project_sharded(psi, q, outcome, n, mesh)


def sample_bits_sharded(psi: jax.Array, key: jax.Array, shots: int, n: int,
                        mesh) -> jax.Array:
    """Bitstring sampling from a MESH-SHARDED state, fully SPMD.

    Hierarchical: (1) each device reduces its shard's total
    probability, an ``all_gather`` of D scalars picks the owning shard
    per shot; (2) every device draws shots from its own 2^k amplitudes
    via the chunked two-level inverse-CDF (``_chunked_invcdf``) and a
    ``psum``-masked select keeps the owner's draw.  No device ever sees
    the full 2^n vector, nothing is gathered to the host, and no
    (shots, 2^k) noise tensor exists (a flat Gumbel categorical over a
    2^30-amp shard would need 4 TB at 1000 shots) — this is what makes
    the 30-34q sampling targets feasible.  Returns a (shots, n) int8
    bit matrix, column q = qubit q; local indices stay int32 (k <= 31),
    so no x64 is needed at any n.
    """
    from jax import lax, shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import AXIS, shard_width

    k = shard_width(mesh, n)
    d = n - k
    lb = _block_bits(k)
    L = 1 << lb

    def body(shard, key):
        shard = shard.reshape(-1)
        i = lax.axis_index(AXIS)
        B = shard.size >> lb
        rows = shard.reshape(B, L)
        s = jnp.sum(probabilities(rows), axis=1)  # fused pass, (B,)
        totals = lax.all_gather(jnp.sum(s), AXIS)  # (D,) tiny
        key_shard, key_local = jax.random.split(key)
        # Same key on every device -> identical shard choices.
        shard_choice = jax.random.categorical(
            key_shard, jnp.log(totals + 1e-38), shape=(shots,))
        cdf = jnp.cumsum(s)
        key_blk, key_loc = jax.random.split(jax.random.fold_in(key_local, i))
        u_b = jax.random.uniform(key_blk, (shots,), dtype=cdf.dtype) * cdf[-1]
        u_l = jax.random.uniform(key_loc, (shots,), dtype=cdf.dtype)
        blocks, offs = _chunked_invcdf(
            cdf, lambda blk: probabilities(rows[blk]), u_b, u_l,
            shots, L, B)
        local = blocks * L + offs
        mine = (shard_choice == i).astype(jnp.int32)
        local_idx = lax.psum(local * mine, AXIS)
        qs = jnp.arange(k, dtype=jnp.int32)
        local_bits = ((local_idx[:, None] >> qs[None, :]) & 1).astype(jnp.int8)
        if d == 0:
            return local_bits
        ds = jnp.arange(d, dtype=shard_choice.dtype)
        dev_bits = ((shard_choice[:, None] >> ds[None, :]) & 1).astype(jnp.int8)
        return jnp.concatenate([local_bits, dev_bits], axis=1)

    fn = shard_map(
        body, mesh=mesh, in_specs=(P(AXIS), P()), out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)(psi, key)
