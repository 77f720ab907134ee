"""Dense gate application on a (shard of a) statevector — pure jnp.

These functions operate on a flat complex jnp array of 2^m amplitudes
(the whole state on one device, or one shard inside ``shard_map``) and
apply unitaries whose qubits are all *local* (index bit < m).

TPU-first design notes
----------------------
* A gate on qubit q is a strided-pair update: the state viewed as
  ``(R, 2, 2^q)`` splits into the q=0 / q=1 planes, and the new planes
  are scalar linear combinations of the old ones.  Reshapes of a C-order
  flat array are free (bitcasts); the combination is a fused elementwise
  VPU pass over HBM — the op is memory-bound by construction.
* Gate matrices are **compile-time constants** (numpy complex128 baked
  into the traced program), so XLA constant-folds coefficients; zero
  and one coefficients are elided *before* tracing (X/SWAP/CNOT cost no
  multiplies, diagonal gates touch only the phased plane).
* Gates whose qubits all sit in the low ``w <= 7`` bits can be fused
  into a single 2^w x 2^w matrix and applied as ONE matmul on the MXU
  (``apply_low_panel``): the 128-lane dimension of the TPU register
  file carries qubits 0..6, so the panel costs a single HBM pass no
  matter how many gates it fuses.  The reference reaches the same goal
  with gather->GEMM->scatter per chunk (wenbo_engine/kernel/cpu_batched.py);
  here the MXU systolic array does it natively.

Endianness: little — qubit 0 is bit 0 of the flat index.
2Q matrices are big-endian in the gate subspace (qubits[0] = MSB), per
the contract (wenbo_engine/kernel/gates.py:3-10).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

def _np_dtype(dtype) -> np.dtype:
    return np.dtype(jnp.dtype(dtype).name)


def _is_const(c) -> bool:
    """True for compile-time-constant coefficients (zero-elidable)."""
    return isinstance(c, (int, float, complex, np.generic, np.ndarray))


def _lincomb(coeffs, arrays):
    """sum(c * a), skipping structural zeros / unit factors of constants.

    Traced (runtime) coefficients are always included — elision only
    applies when the gate matrix is a compile-time numpy constant.
    """
    acc = None
    for c, a in zip(coeffs, arrays):
        if _is_const(c) and c == 0:
            continue
        term = a if (_is_const(c) and c == 1) else c * a
        acc = term if acc is None else acc + term
    if acc is None:
        return jnp.zeros_like(arrays[0])
    return acc


def _const_coeffs(U, dtype):
    """Cast the gate matrix to the state dtype.

    numpy input stays numpy (entries become python/numpy scalars that
    XLA constant-folds and `_lincomb` can elide); traced jnp input is
    cast in-graph.
    """
    if isinstance(U, np.ndarray):
        return np.asarray(U, dtype=_np_dtype(dtype))
    return U.astype(jnp.dtype(dtype))


def apply_1q(psi: jnp.ndarray, q: int, U: np.ndarray) -> jnp.ndarray:
    """Apply a 2x2 unitary to local qubit q.  psi: flat (2^m,) complex.

    Flip formulation: out = x * D + flip(x) * O with broadcast constants
    D = [u00, u11], O = [u01, u10] — ONE fused elementwise pass (the
    earlier slice-and-stack form compiled to ~6x slower strided passes).
    """
    size = psi.size
    C = 1 << q
    R = size >> (q + 1)
    if isinstance(U, np.ndarray):
        u = np.asarray(U, dtype=np.complex128)
        x = psi.reshape(R, 2, C)
        npdt = _np_dtype(psi.dtype)
        D = np.array([u[0, 0], u[1, 1]], dtype=npdt).reshape(1, 2, 1)
        O = np.array([u[0, 1], u[1, 0]], dtype=npdt).reshape(1, 2, 1)
        acc = None
        if D.any():
            acc = x if (D == 1).all() else x * jnp.asarray(D)
        if O.any():
            rev = jnp.flip(x, axis=1)
            term = rev if (O == 1).all() else rev * jnp.asarray(O)
            acc = term if acc is None else acc + term
        if acc is None:
            acc = jnp.zeros_like(x)
        return acc.reshape(size)
    # Traced matrix: keep the explicit linear combination.
    ut = _const_coeffs(U, psi.dtype)
    x = psi.reshape(R, 2, C)
    a, b = x[:, 0, :], x[:, 1, :]
    out0 = _lincomb((ut[0, 0], ut[0, 1]), (a, b))
    out1 = _lincomb((ut[1, 0], ut[1, 1]), (a, b))
    return jnp.stack((out0, out1), axis=1).reshape(size)


def apply_2q(psi: jnp.ndarray, qa: int, qb: int, U: np.ndarray) -> jnp.ndarray:
    """Apply a 4x4 unitary (big-endian subspace, qa = MSB) to local qa, qb.

    Flip formulation: the update decomposes over the four relative flip
    patterns of the two gate bits,

        out = sum_f flip_f(x) * C_f,   C_f[h, l] = U[s(h,l), s(h^fh, l^fl)]

    with C_f broadcast (1,2,1,2,1) constants — one fused elementwise
    pass, structurally-zero patterns elided (CNOT keeps two terms).
    """
    size = psi.size
    hi, lo = (qa, qb) if qa > qb else (qb, qa)
    C = 1 << lo
    B = 1 << (hi - lo - 1)
    A = size >> (hi + 1)
    npdt = _np_dtype(psi.dtype)

    def sub(h: int, l: int) -> int:
        """(hi_bit, lo_bit) -> big-endian gate-subspace index."""
        return (h << 1) | l if qa == hi else (l << 1) | h

    x = psi.reshape(A, 2, B, 2, C)

    if not isinstance(U, np.ndarray):
        # Traced matrix (exchange blocks): explicit linear combination.
        ut = _const_coeffs(U, psi.dtype)
        planes = {(h, l): x[:, h, :, l, :] for h in (0, 1) for l in (0, 1)}
        outs = {}
        for h in (0, 1):
            for l in (0, 1):
                row = sub(h, l)
                coeffs = [ut[row, sub(h2, l2)] for h2 in (0, 1) for l2 in (0, 1)]
                arrays = [planes[(h2, l2)] for h2 in (0, 1) for l2 in (0, 1)]
                outs[(h, l)] = _lincomb(coeffs, arrays)
        lo_st = [jnp.stack((outs[(h, 0)], outs[(h, 1)]), axis=2)
                 for h in (0, 1)]
        return jnp.stack(lo_st, axis=1).reshape(size)

    u = np.asarray(U, dtype=np.complex128)
    acc = None
    for fh in (0, 1):
        for fl in (0, 1):
            Cf = np.zeros((2, 2), dtype=npdt)
            for h in (0, 1):
                for l in (0, 1):
                    Cf[h, l] = u[sub(h, l), sub(h ^ fh, l ^ fl)]
            if not Cf.any():
                continue
            term = x
            if fh:
                term = jnp.flip(term, axis=1)
            if fl:
                term = jnp.flip(term, axis=3)
            if not (Cf == 1).all():
                term = term * jnp.asarray(Cf.reshape(1, 2, 1, 2, 1))
            acc = term if acc is None else acc + term
    if acc is None:
        acc = jnp.zeros_like(x)
    return acc.reshape(size)


def apply_mq(psi: jnp.ndarray, qubits: tuple[int, ...], U: np.ndarray) -> jnp.ndarray:
    """Apply an m-qubit unitary to arbitrary local qubits.

    Dispatches: 1Q/2Q go through the fused elementwise strided-plane
    paths (one HBM pass each); m >= 3 uses the tensor-contraction path.
    """
    m = len(qubits)
    if m == 1:
        return apply_1q(psi, qubits[0], U)
    if m == 2:
        return apply_2q(psi, qubits[0], qubits[1], U)
    return apply_mq_einsum(psi, qubits, U)


def apply_mq_einsum(psi: jnp.ndarray, qubits: tuple[int, ...], U: np.ndarray) -> jnp.ndarray:
    """m-qubit unitary via tensor reshape + dot_general (any m <= 10).

    View the state as a rank-m_total tensor of 2s (axis j carries qubit
    m_total-1-j), move the gate axes to the front, and contract with the
    2^m x 2^m matrix on the MXU.  XLA compiles this to
    transpose -> matmul -> transpose: ~3 HBM passes, independent of m —
    cheaper than m elementwise passes for m >= 3 and the fallback for
    fused multi-qubit blocks whose qubits are not in the low panel.
    """
    m = len(qubits)
    n_total = int(np.log2(psi.size))
    dim = 1 << m
    u = jnp.asarray(_const_coeffs(U, psi.dtype))
    x = psi.reshape((2,) * n_total)
    # axis for qubit q is (n_total - 1 - q); U is big-endian: qubits[0]=MSB.
    gate_axes = [n_total - 1 - q for q in qubits]
    x = jnp.moveaxis(x, gate_axes, range(m))
    rest = x.shape[m:]
    x = x.reshape(dim, -1)
    y = jnp.matmul(u, x, precision=MATMUL_PRECISION)
    y = y.reshape((2,) * m + rest)
    y = jnp.moveaxis(y, range(m), gate_axes)
    return y.reshape(psi.size)


def expand_to_low_block(qubits: tuple[int, ...], U: np.ndarray, width: int) -> np.ndarray:
    """Expand an m-qubit gate to a 2^width x 2^width matrix over bits 0..width-1.

    The result W is little-endian over the low `width` bits and satisfies
    (psi.reshape(-1, 2^width) @ W.T) == gate applied.  All gate qubits
    must be < width.
    """
    m = len(qubits)
    assert all(q < width for q in qubits)
    dim = 1 << width
    idx = np.arange(dim)
    # gate subspace index of each low-block index (big-endian gate order)
    sub = np.zeros(dim, dtype=np.int64)
    for j, q in enumerate(qubits):
        sub |= ((idx >> q) & 1) << (m - 1 - j)
    other_mask = (dim - 1) ^ sum(1 << q for q in qubits)
    other = idx & other_mask
    W = np.zeros((dim, dim), dtype=np.complex128)
    same = other[:, None] == other[None, :]
    W[same] = np.asarray(U, dtype=np.complex128)[sub[:, None], sub[None, :]][same]
    return W


def compose_low_panel(ops: list[tuple[tuple[int, ...], np.ndarray]], width: int) -> np.ndarray:
    """Fuse a sequence of gates (applied first-to-last) on low qubits into one W."""
    W = np.eye(1 << width, dtype=np.complex128)
    for qubits, U in ops:
        W = expand_to_low_block(tuple(qubits), U, width) @ W
    return W


def compose_low_panel_traced(
    ops: list[tuple[tuple[int, ...], np.ndarray]], width: int, fdtype,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """In-graph panel composition: returns traced (Wr, Wi) f32 planes.

    Only the tiny per-gate matrices enter the program as literals; the
    2^width-wide expansion and the composition products are graph ops
    that XLA constant-folds server-side.  This keeps compile payloads
    small (a baked 128x128 plane is 64 KB of literal PER PANEL — serial
    circuits emitted megabytes).
    """
    dim = 1 << width
    cdtype = jnp.complex128 if jnp.dtype(fdtype) == jnp.float64 else jnp.complex64
    W = jnp.eye(dim, dtype=cdtype)
    for qubits, U in ops:
        E = _expand_low_traced(
            tuple(qubits), jnp.asarray(np.asarray(U, dtype=cdtype)), width
        )
        W = jnp.matmul(E, W, precision=MATMUL_PRECISION)
    return jnp.real(W).astype(fdtype), jnp.imag(W).astype(fdtype)


def apply_low_panel(psi: jnp.ndarray, W: np.ndarray) -> jnp.ndarray:
    """Apply a fused low-qubit block: one MXU matmul over the whole state."""
    width_dim = W.shape[0]
    w = jnp.asarray(_const_coeffs(W, psi.dtype))
    x = psi.reshape(-1, width_dim)
    y = jnp.matmul(x, w.T, precision=MATMUL_PRECISION)
    return y.reshape(psi.size)


def _expand_low_traced(qubits: tuple[int, ...], U, width: int):
    """Traced-matrix version of :func:`expand_to_low_block` (jnp gather)."""
    m = len(qubits)
    dim = 1 << width
    idx = np.arange(dim)
    sub = np.zeros(dim, dtype=np.int32)
    for j, q in enumerate(qubits):
        sub |= ((idx >> q) & 1) << (m - 1 - j)
    other_mask = (dim - 1) ^ sum(1 << q for q in qubits)
    other = idx & other_mask
    same = jnp.asarray(other[:, None] == other[None, :])
    gathered = U[sub[:, None], sub[None, :]]
    return jnp.where(same, gathered, jnp.zeros((), dtype=U.dtype))


# ---------------------------------------------------------------------------
# Layout-aware dispatch
# ---------------------------------------------------------------------------
#
# TPU arrays tile the last dim to 128 lanes (and the second-to-last to 8
# sublanes for f32).  A strided-plane view (R, 2, 2^q) for a gate on a
# low qubit has a tiny trailing dim, and any intermediate materialised
# in that layout pads catastrophically (measured: a single H on qubit 0
# of an n=24 state costs 4.3 GB of temp HBM vs the 134 MB buffer).
# Rule: a gate whose qubits are all >= LANE_QUBITS uses the plane path
# (trailing dim >= 128); anything touching low qubits goes through a
# 2^LANE_QUBITS-wide matmul on the MXU, where the lane dimension carries
# qubits 0..6 natively.

LANE_QUBITS = 7


def _lane_width(psi_size: int, lane_bits: int | None) -> int:
    m = int(np.log2(psi_size))
    return min(LANE_QUBITS if lane_bits is None else lane_bits, m)


# Complex64 lowers to f32 matmuls, and TPU's default matmul precision
# computes f32 dots in bf16 passes — unacceptable drift for amplitude
# algebra (measured 1.3% norm error over 223 gates).  HIGHEST forces
# full-precision accumulation; the panels are tiny (<=128 wide) so the
# extra MXU passes are invisible next to HBM bandwidth.
MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def _lane_matmul(data: jnp.ndarray, L, lane: int) -> jnp.ndarray:
    """Apply a 2^lane x 2^lane matrix over the low `lane` bits of data's
    trailing dim (which must be a multiple of 2^lane)."""
    dim = 1 << lane
    shape = data.shape
    x = data.reshape(shape[:-1] + (shape[-1] // dim, dim))
    y = jnp.matmul(x, L.T, precision=MATMUL_PRECISION)
    return y.reshape(shape)


def _gate_subspace_index(qubits, sel_pos, pattern_bits, m):
    s = 0
    for t, j in enumerate(sel_pos):
        s |= pattern_bits[t] << (m - 1 - j)
    return s


def _general_plane_apply(psi, qubits: tuple[int, ...], U, lane: int):
    """Gate with high-bit planes and (optionally) low-bit lane matmuls.

    Decomposes the gate over its high qubits (>= lane): the state viewed
    with one 2-axis per high qubit; each output plane is a sum over
    input planes of either a scalar coefficient (no low qubits) or a
    2^lane-wide lane matmul carrying the low-qubit block.  Structurally
    zero blocks of constant matrices are skipped at trace time.
    """
    m = len(qubits)
    is_const = isinstance(U, np.ndarray)
    high_pos = [j for j, q in enumerate(qubits) if q >= lane]
    low_pos = [j for j, q in enumerate(qubits) if q < lane]
    high = [qubits[j] for j in high_pos]
    low = tuple(qubits[j] for j in low_pos)
    r, p = len(high), len(low)
    assert r >= 1

    # View: interleave a 2-axis at each high qubit (descending order).
    order = sorted(range(r), key=lambda t: -high[t])
    shape: list[int] = []
    prev = int(np.log2(psi.size))
    for t in order:
        q = high[t]
        shape.extend([1 << (prev - q - 1), 2])
        prev = q
    shape.append(1 << prev)
    x = psi.reshape(shape)

    def plane(bits: tuple[int, ...]):
        """bits[t] = value of high[t]; extract the (A0..A_{r-1}, C) plane."""
        idx: list = [slice(None)]
        for t in order:
            idx.append(bits[t])
            idx.append(slice(None))
        return x[tuple(idx)]

    patterns = [
        tuple((s >> (r - 1 - t)) & 1 for t in range(r)) for s in range(1 << r)
    ]

    # Low-subspace index offsets (big-endian over `low` appearance order).
    lo_off = np.zeros(1 << p, dtype=np.int64)
    for ls in range(1 << p):
        lo_off[ls] = _gate_subspace_index(
            qubits, low_pos, [(ls >> (p - 1 - t)) & 1 for t in range(p)], m
        )

    u_np = U if is_const else None

    def block(a_out: tuple[int, ...], a_in: tuple[int, ...]):
        """(is_zero, operator applied to a plane) for this high-bit pair."""
        ro = _gate_subspace_index(qubits, high_pos, a_out, m)
        ci = _gate_subspace_index(qubits, high_pos, a_in, m)
        if p == 0:
            c = u_np[ro, ci] if is_const else U[ro, ci]
            if is_const and c == 0:
                return None
            return lambda d: d if (is_const and c == 1) else c * d
        if is_const:
            sub = u_np[np.ix_(ro + lo_off, ci + lo_off)]
            if not sub.any():
                return None
            # Ship only the tiny 2^p x 2^p block; the 2^lane-wide
            # expansion happens in-graph (XLA constant-folds it) —
            # baking the expanded matrix put a 128 KB literal in the
            # program per block, which blew up compile payloads.
            sub_c = np.asarray(sub, dtype=_np_dtype(psi.dtype))
            L = _expand_low_traced(low, jnp.asarray(sub_c), lane)
            return lambda d: _lane_matmul(d, L, lane)
        sub = U[jnp.asarray(ro + lo_off)[:, None], jnp.asarray(ci + lo_off)[None, :]]
        L = _expand_low_traced(low, sub, lane)
        return lambda d: _lane_matmul(d, L, lane)

    planes = {bits: plane(bits) for bits in patterns}
    outs = {}
    for a_out in patterns:
        acc = None
        for a_in in patterns:
            op = block(a_out, a_in)
            if op is None:
                continue
            term = op(planes[a_in])
            acc = term if acc is None else acc + term
        outs[a_out] = acc if acc is not None else jnp.zeros_like(planes[a_out])

    # Reassemble: insert the bit axis for order[d] at axis d+1, deepest first.
    def assemble(prefix: tuple[int, ...], depth: int):
        if depth == r:
            # prefix is in `order` sequence; map back to high[t] order.
            bits = [0] * r
            for d2, t in enumerate(order):
                bits[t] = prefix[d2]
            return outs[tuple(bits)]
        a = assemble(prefix + (0,), depth + 1)
        b = assemble(prefix + (1,), depth + 1)
        return jnp.stack((a, b), axis=depth + 1)

    return assemble((), 0).reshape(psi.size)


def apply_diag_bcast(psi: jnp.ndarray, qubits: tuple[int, ...], U: np.ndarray,
                     *, lane_bits: int | None = None) -> jnp.ndarray:
    """Diagonal gate as ONE broadcast multiply (no matmul, no gather).

    The state is viewed with a 2-axis per high gate qubit and the lane
    bits as the trailing 2^lane axis; the gate's diagonal expands to a
    tiny constant tensor broadcast over that view.  Runs of diagonal
    gates (QFT's CR ladder, QAOA's RZZ layers, CZ/CP anywhere) fuse
    into a single elementwise HBM pass under XLA — the trailing dim
    stays >= 128 so no layout padding occurs.
    """
    lane = _lane_width(psi.size, lane_bits)
    m = len(qubits)
    d = np.diag(np.asarray(U, dtype=_np_dtype(psi.dtype)))
    low = [q for q in qubits if q < lane]
    high = sorted((q for q in qubits if q >= lane), reverse=True)

    # Build the interleaved view (A0, 2, A1, 2, ..., C) over high qubits.
    shape: list[int] = []
    gate_axis: list[bool] = []
    prev = int(np.log2(psi.size))
    for q in high:
        shape.extend([1 << (prev - q - 1), 2])
        gate_axis.extend([False, True])
        prev = q
    trailing = 1 << prev  # contains all bits < min(high) incl. the lanes
    lane_dim = 1 << lane
    # Only split out the lane axis when the gate actually touches low
    # qubits: otherwise the phase constant is 2^|high| entries instead
    # of 2^|high| * 128 (program size matters — a 325-CR QFT emitted
    # 5 MB of MLIR constants with unconditional lane axes).
    if low:
        shape.extend([trailing // lane_dim, lane_dim])
        gate_axis.extend([False, False])
        last_dim = lane_dim
    else:
        shape.append(trailing)
        gate_axis.append(False)
        last_dim = 1
    x = psi.reshape(shape)

    # Constant phase tensor: one 2-axis per high gate qubit (+ lanes).
    p_shape = [(2 if is_gate else 1) for is_gate in gate_axis]
    p_shape[-1] = last_dim
    P = np.zeros(p_shape, dtype=_np_dtype(psi.dtype))
    hi_patterns = [
        tuple((t >> (len(high) - 1 - j)) & 1 for j in range(len(high)))
        for t in range(1 << len(high))
    ]
    lanes = np.arange(last_dim)
    for bits in hi_patterns:
        sub = np.zeros(last_dim, dtype=np.int64)
        for j, q in enumerate(qubits):
            if q < lane:
                sub |= ((lanes >> q) & 1) << (m - 1 - j)
            else:
                hj = high.index(q)
                sub |= bits[hj] << (m - 1 - j)
        idx: list = []
        hj = 0
        for is_gate in gate_axis[:-1]:
            if is_gate:
                idx.append(bits[hj])
                hj += 1
            else:
                idx.append(0)
        P[tuple(idx)] = d[sub]
    return (x * jnp.asarray(P)).reshape(psi.size)


_SWAP4 = np.array([[1, 0, 0, 0], [0, 0, 1, 0],
                   [0, 1, 0, 0], [0, 0, 0, 1]], dtype=np.complex128)


def _swap_axes_view(size: int, qa: int, qb: int):
    """(view_shape, axis_a, axis_b) for exchanging bits qa and qb."""
    hi, lo = (qa, qb) if qa > qb else (qb, qa)
    C = 1 << lo
    B = 1 << (hi - lo - 1)
    A = size >> (hi + 1)
    return (A, 2, B, 2, C), 1, 3


def apply_swap(psi: jnp.ndarray, qa: int, qb: int) -> jnp.ndarray:
    """SWAP as a pure axis transpose (one well-laid-out pass, ~460 GB/s
    measured — the mixed/plane paths cost 2-3x that for the same gate)."""
    shape, a1, a2 = _swap_axes_view(psi.size, qa, qb)
    return jnp.swapaxes(psi.reshape(shape), a1, a2).reshape(psi.size)


def apply_gate(psi: jnp.ndarray, qubits: tuple[int, ...], U, *, lane_bits: int | None = None) -> jnp.ndarray:
    """TPU-layout-aware gate application (the production dispatcher).

    * SWAP               -> one axis transpose
    * diagonal           -> one broadcast multiply (fuses with neighbours)
    * all qubits < lane  -> one 2^lane-wide MXU matmul
    * all qubits >= lane -> strided-plane elementwise path
    * mixed              -> high-bit plane decomposition with lane
                            matmuls carrying the low-qubit block
    """
    lane = _lane_width(psi.size, lane_bits)
    qubits = tuple(qubits)
    if (
        isinstance(U, np.ndarray)
        and len(qubits) == 2
        and min(qubits) >= lane  # a low qubit would make a tiny-dim view
        and U.shape == (4, 4)
        and np.array_equal(np.asarray(U, dtype=np.complex128), _SWAP4)
    ):
        return apply_swap(psi, qubits[0], qubits[1])
    if (
        isinstance(U, np.ndarray)
        and len(qubits) <= 12
        and np.allclose(U, np.diag(np.diag(U)), atol=0)
    ):
        return apply_diag_bcast(psi, qubits, U, lane_bits=lane_bits)
    low = [q for q in qubits if q < lane]
    high = [q for q in qubits if q >= lane]
    if isinstance(U, np.ndarray) and jax.default_backend() == "cpu":
        # XLA:CPU compiles the constant-dispatch graphs (structural-zero
        # skipping + baked plane coefficients) pathologically for long
        # chains of non-diagonal gates — a 71-gate n=18 QASMBench
        # circuit took >300 s vs 3 s through the traced-operand form of
        # the SAME dispatcher.  TPU (the production backend) keeps the
        # constant form, whose zero-skipping is measured-faster there.
        U = jnp.asarray(U, dtype=psi.dtype)
    if not low:
        if len(qubits) <= 2:
            return apply_mq(psi, qubits, U)
        return _general_plane_apply(psi, qubits, U, lane)
    if not high:
        if isinstance(U, np.ndarray):
            W = expand_to_low_block(qubits, U, lane)
        else:
            W = _expand_low_traced(qubits, U, lane)
        return apply_low_panel(psi, W)
    return _general_plane_apply(psi, qubits, U, lane)


def _rotation_steps(r: int, n: int) -> list[int]:
    """Decompose a bit rotation into steps whose transpose dims are all
    >= 128 (r_i in [7, n-7]); a (2^a, 2^b) transpose with a tiny dim
    pads catastrophically on TPU (measured 16x for (8, 2^25))."""
    r %= n
    if r == 0:
        return []
    if n < 16:
        return [r]  # state too small for padding to matter
    if 7 <= r <= n - 7:
        return [r]
    for a in range(7, n - 6):
        b = (r - a) % n
        if 0 < b and 7 <= b <= n - 7:
            return [a, b]
    return [r]  # unreachable for n >= 14


def rotate_bits_right(psi: jnp.ndarray, r: int) -> jnp.ndarray:
    """Cyclically rotate index-bit positions down by r: new bit j = old bit (j+r) mod n.

    Equivalently the low r bits move to the top.  Each step is a
    (2^(n-r_i), 2^r_i) transpose — one well-laid-out HBM pass; extreme
    rotations are decomposed so both transpose dims stay >= 128.  This
    is the engine of the rotating-panel schedule: after a rotation by
    r, the qubits that were at positions r..r+6 occupy the 128-lane
    window [0, 7).
    """
    n = int(np.log2(psi.size))
    for step in _rotation_steps(r, n):
        psi = psi.reshape(1 << (n - step), 1 << step).T.reshape(psi.size)
    return psi


def zero_state(m: int, dtype=jnp.complex64) -> jnp.ndarray:
    psi = jnp.zeros(1 << m, dtype=dtype)
    return psi.at[0].set(1.0)


def zero_state_planar(m: int, fdtype=jnp.float32):
    """|0...0> as (re, im) f32 planes — no complex materialisation.

    The capacity tier (n >= 29) must create the state planar: building
    a complex64 vector first would cost 2x the plane footprint.
    """
    re = jnp.zeros(1 << m, dtype=fdtype).at[0].set(1.0)
    im = jnp.zeros(1 << m, dtype=fdtype)
    return re, im


# ---------------------------------------------------------------------------
# Planar (split re/im) gate application — the window executor's native form
# ---------------------------------------------------------------------------

def _planar_terms(coeffs, planes):
    """sum(c * x) on (re, im) plane pairs with constant-zero elision."""
    acc_re = None
    acc_im = None

    def add(acc, term):
        return term if acc is None else acc + term

    for c, (xr, xi) in zip(coeffs, planes):
        cr, ci = float(np.real(c)), float(np.imag(c))
        if cr != 0.0:
            f = (lambda t: t) if cr == 1.0 else (lambda t, cr=cr: cr * t)
            acc_re = add(acc_re, f(xr))
            acc_im = add(acc_im, f(xi))
        if ci != 0.0:
            acc_re = add(acc_re, (-ci) * xi)
            acc_im = add(acc_im, ci * xr)
    if acc_re is None:
        acc_re = jnp.zeros_like(planes[0][0])
        acc_im = jnp.zeros_like(planes[0][1])
    return acc_re, acc_im


def apply_gate_planar(re, im, qubits: tuple[int, ...], U: np.ndarray,
                      *, lane_bits: int | None = None):
    """Gate application on f32 re/im planes (no complex materialisation).

    Handles the cases the fixed-window executor needs between Pallas
    panels: constant diagonal gates (broadcast multiply on the planes)
    and 1q/2q gates on high qubits (strided-plane linear combinations).
    Returns None when the gate needs the complex mixed path (caller
    converts).  Everything here is elementwise, so consecutive planar
    gates fuse into shared HBM passes under XLA.
    """
    lane = _lane_width(re.size, lane_bits)
    qubits = tuple(qubits)
    U = np.asarray(U)
    m = len(qubits)

    if m == 2 and min(qubits) >= lane and U.shape == (4, 4) and np.array_equal(
        np.asarray(U, dtype=np.complex128), _SWAP4
    ):
        shape, a1, a2 = _swap_axes_view(re.size, qubits[0], qubits[1])
        return (
            jnp.swapaxes(re.reshape(shape), a1, a2).reshape(re.size),
            jnp.swapaxes(im.reshape(shape), a1, a2).reshape(im.size),
        )

    if m <= 12 and np.allclose(U, np.diag(np.diag(U)), atol=0):
        # psi' = P * psi  ->  re' = Pr*re - Pi*im ; im' = Pi*re + Pr*im.
        Pr, Pi, view_shape = _diag_bcast_planes(re.size, qubits, U, lane,
                                                np.dtype(re.dtype))
        xr = re.reshape(view_shape)
        xi = im.reshape(view_shape)
        o_re = xr * Pr - (xi * Pi if Pi is not None else 0)
        o_im = (xr * Pi if Pi is not None else 0) + xi * Pr
        return o_re.reshape(re.size), o_im.reshape(im.size)

    if m == 1 or (all(q >= lane for q in qubits) and m == 2):
        fdt = np.dtype(re.dtype)

        def cmul_acc(acc, xr, xi, Cnp):
            """acc += C * (xr + i xi) with broadcast complex constant."""
            Cr = np.real(Cnp).astype(fdt)
            Ci = np.imag(Cnp).astype(fdt)
            ar, ai = acc
            if Cr.any():
                crj = jnp.asarray(Cr)
                t_re, t_im = xr * crj, xi * crj
                ar = t_re if ar is None else ar + t_re
                ai = t_im if ai is None else ai + t_im
            if Ci.any():
                cij = jnp.asarray(Ci)
                t_re, t_im = -(xi * cij), xr * cij
                ar = t_re if ar is None else ar + t_re
                ai = t_im if ai is None else ai + t_im
            return (ar, ai)

        if m == 1:
            # Any qubit position: the (R, 2, C) strided-plane lincomb is
            # valid for sub-lane strides too (slower flips, but callers
            # only reach here for gates outside every panel/kernel).
            q = qubits[0]
            C = 1 << q
            R = re.size >> (q + 1)
            xr = re.reshape(R, 2, C)
            xi = im.reshape(R, 2, C)
            D = np.array([U[0, 0], U[1, 1]]).reshape(1, 2, 1)
            O = np.array([U[0, 1], U[1, 0]]).reshape(1, 2, 1)
            acc = cmul_acc((None, None), xr, xi, D)
            if O.any():
                acc = cmul_acc(acc, jnp.flip(xr, 1), jnp.flip(xi, 1), O)
            ar = acc[0] if acc[0] is not None else jnp.zeros_like(xr)
            ai = acc[1] if acc[1] is not None else jnp.zeros_like(xi)
            return ar.reshape(re.size), ai.reshape(im.size)

        qa, qb = qubits
        hi, lo = (qa, qb) if qa > qb else (qb, qa)
        C = 1 << lo
        B = 1 << (hi - lo - 1)
        A = re.size >> (hi + 1)
        xr = re.reshape(A, 2, B, 2, C)
        xi = im.reshape(A, 2, B, 2, C)

        def sub(h, l):
            return (h << 1) | l if qa == hi else (l << 1) | h

        acc = (None, None)
        for fh in (0, 1):
            for fl in (0, 1):
                Cf = np.zeros((2, 2), dtype=np.complex128)
                for h in (0, 1):
                    for l in (0, 1):
                        Cf[h, l] = U[sub(h, l), sub(h ^ fh, l ^ fl)]
                if not Cf.any():
                    continue
                tr, ti = xr, xi
                if fh:
                    tr, ti = jnp.flip(tr, 1), jnp.flip(ti, 1)
                if fl:
                    tr, ti = jnp.flip(tr, 3), jnp.flip(ti, 3)
                acc = cmul_acc(acc, tr, ti, Cf.reshape(1, 2, 1, 2, 1))
        ar = acc[0] if acc[0] is not None else jnp.zeros_like(xr)
        ai = acc[1] if acc[1] is not None else jnp.zeros_like(xi)
        return ar.reshape(re.size), ai.reshape(im.size)

    return None  # mixed path: caller converts to complex


def apply_diag_planar(re, im, qubits: tuple[int, ...], d: np.ndarray,
                      *, lane_bits: int | None = None):
    """Diagonal operator (given as its 2^m phase VECTOR) on f32 planes.

    The broadcast-multiply path of :func:`apply_gate_planar` without
    the m<=12 matrix checks — any m the view rank allows (merged runs
    go to 13).  Everything is elementwise, so consecutive diagonals
    fuse into shared HBM passes under XLA.
    """
    lane = _lane_width(re.size, lane_bits)
    Pr, Pi, view_shape = _diag_bcast_planes(
        re.size, tuple(qubits), d, lane, np.dtype(re.dtype))
    xr = re.reshape(view_shape)
    xi = im.reshape(view_shape)
    o_re = xr * Pr - (xi * Pi if Pi is not None else 0)
    o_im = (xr * Pi if Pi is not None else 0) + xi * Pr
    return o_re.reshape(re.size), o_im.reshape(im.size)


def _shear_tables(d: np.ndarray):
    """(sign, tan(theta/2), sin(theta)) for the three-shear rotation."""
    d = np.asarray(d, dtype=np.complex128)
    if d.ndim == 2:
        d = np.diag(d)
    theta = np.angle(d)
    neg = np.cos(theta) < 0.0
    sign = np.where(neg, -1.0, 1.0)
    theta = np.where(neg, np.angle(d * -1.0), theta)
    return sign, np.tan(theta / 2.0), np.sin(theta)


def _row_gather_shear(re, im, qubits, d, lane, fdt, *, lane_mask_bit=None):
    """Three-shear rotation with per-ROW phases gathered in-graph.

    ``qubits`` are row bits (>= lane); the 2^m phase table is gathered
    into (R, 1) vectors by row pattern.  ``lane_mask_bit`` restricts
    the rotation to lanes with that bit set (the masked factor of a
    (lane, row) 2q diag); identity shears (t=si=0) make masked-out
    lanes exact no-ops.
    """
    import jax.numpy as jnp

    m = len(qubits)
    R = re.size >> lane
    sign, t, si = _shear_tables(np.asarray(d, dtype=np.complex128))
    need_sign = bool((sign < 0).any())
    if not (np.any(t != 0.0) or np.any(si != 0.0) or need_sign):
        return re, im

    rows = jnp.arange(R, dtype=jnp.int32 if R <= (1 << 31) else jnp.int64)
    rpat = jnp.zeros_like(rows)
    for j, q in enumerate(qubits):
        rpat = rpat | (((rows >> (q - lane)) & 1) << (m - 1 - j))

    lm = None
    if lane_mask_bit is not None:
        lanes = jnp.arange(1 << lane)
        lm = (((lanes >> lane_mask_bit) & 1)).astype(fdt)[None, :]

    def vec(tab):
        # (R, 1) gather + optional (1, 128) mask stay SEPARATE factors:
        # their product is a full plane (4 GiB at n=30).
        v = jnp.take(jnp.asarray(tab.astype(fdt)), rpat)[:, None]
        return (v,) if lm is None else (v, lm)

    S = None
    if need_sign:
        # (sign - 1) factors: r*sign == r + r*(sign-1), and the masked
        # form 1+(sv-1)*lm factors the same way.
        sv = jnp.take(jnp.asarray((sign - 1.0).astype(fdt)), rpat)[:, None]
        S = (sv,) if lm is None else (sv, lm)
    return _apply_shears(
        re, im, (R, 1 << lane), S, vec(t), vec(si), need_sign)


def _apply_shears(re, im, view, S, T, SI, need_sign):
    """The three-shear rotation with broadcast constants over `view`.

    ``S``/``T``/``SI`` are TUPLES of broadcast factors, multiplied into
    the plane one by one so XLA fuses each step into a single
    elementwise pass (pre-multiplying a (R,1) by a (1,128) factor
    would materialize a full plane).  ``S`` holds (sign-1) factors.

    re/im come in flat and leave flat.  An optimization barrier after
    every step pins the schedule so only ONE intermediate plane is
    live at a time (3 planes total with the two state planes) — at
    n=30 the unbarriered chain held two 4 GiB temps and overflowed a
    16 GiB chip by 264 MB.
    """
    import jax

    N = re.size

    def mul(x, fs):
        for f in fs:
            x = x * f
        return x

    def bar(r, i):
        # Flatten BEFORE the barrier: each step's fusion then has the
        # same flat {T(1024)} layout as the donated plane buffers, so
        # buffer assignment can write it in place.  A tiled (A,8,128)
        # output cannot share a flat arg buffer, which kept two 4 GiB
        # temps live and overflowed n=30 by 265 MB.
        r, i = jax.lax.optimization_barrier((r.reshape(N), i.reshape(N)))
        return r.reshape(view), i.reshape(view)

    r = re.reshape(view)
    i = im.reshape(view)
    if need_sign:
        r = r + mul(r, S)
        i = i + mul(i, S)
        r, i = bar(r, i)
    r = r - mul(i, T)
    r, i = bar(r, i)
    i = i + mul(r, SI)
    r, i = bar(r, i)
    r = r - mul(i, T)
    return r.reshape(re.size), i.reshape(im.size)


def _low_table_shear(re, im, qubits, d, lane, fdt, *, row_mask_bit=None):
    """Three-shear rotation with (1, 8, 2^lane) broadcast tables.

    ``qubits`` all live below lane+3 (lane bits index the trailing
    2^lane axis, bits [lane, lane+3) the middle 8-axis).
    ``row_mask_bit`` (>= lane+3) restricts the rotation to rows with
    that A-axis bit set — the masked factor of a (low-set, high-bit)
    mixed diagonal.
    """
    import jax.numpy as jnp

    m = len(qubits)
    sign, t, si = _shear_tables(np.asarray(d, dtype=np.complex128))
    need_sign = bool((sign < 0).any())
    if not (np.any(t != 0.0) or np.any(si != 0.0) or need_sign):
        return re, im

    lanes = np.arange(1 << lane)
    rows8 = np.arange(8)
    sub = np.zeros((8, 1 << lane), dtype=np.int64)
    for j, q in enumerate(qubits):
        bit = (
            (rows8[:, None] >> (q - lane)) & 1 if q >= lane
            else (lanes[None, :] >> q) & 1
        )
        sub |= bit << (m - 1 - j)

    A = re.size // (8 << lane)
    mask = None
    if row_mask_bit is not None:
        a = jnp.arange(A)
        mask = (((a >> (row_mask_bit - lane - 3)) & 1)
                ).astype(fdt)[:, None, None]

    def tab(v):
        # (1, 8, 128) table + optional (A, 1, 1) mask stay separate
        # factors (their product is a full plane).
        x = jnp.asarray(v[sub].astype(fdt))[None, :, :]
        return (x,) if mask is None else (x, mask)

    S = None
    if need_sign:
        sv = jnp.asarray((sign - 1.0)[sub].astype(fdt))[None, :, :]
        S = (sv,) if mask is None else (sv, mask)
    return _apply_shears(
        re, im, (A, 8, 1 << lane), S, tab(t), tab(si), need_sign)


def apply_diag_terms_planar(re, im, terms):
    """Exact Möbius-terms diagonal on planes — small-state fallback.

    ``terms`` is the DiagOp decomposition (((qubits...), coeff), ...):
    theta[i] = sum of coeff over terms whose qubit subset is all-ones
    in i.  Used when the state is too small for the fused Pallas diag
    kernel's (8, 128) block minimum (tests / tiny shards); everything
    is elementwise, so XLA fuses the whole evaluation into one pass.
    """
    import jax.numpy as jnp

    N = re.size
    idx = jnp.arange(N, dtype=jnp.uint32)
    theta = jnp.zeros(N, dtype=re.dtype)
    for qs, c in terms:
        allset = jnp.ones(N, dtype=re.dtype)
        for q in qs:
            allset = allset * ((idx >> q) & 1).astype(re.dtype)
        theta = theta + np.dtype(re.dtype).type(c) * allset
    cr = jnp.cos(theta)
    sr = jnp.sin(theta)
    return re * cr - im * sr, im * cr + re * sr


def apply_diag_planar_shear(re, im, qubits: tuple[int, ...], d: np.ndarray,
                            *, lane_bits: int | None = None):
    """Diagonal phases via in-place-friendly shears on LAYOUT-SAFE views.

    Capacity-tier (n >= 29) diag application: the direct broadcast
    peaks at 4 live planes (16 GiB at n=30) and its interleaved
    per-qubit views force padded layouts.  Three cases, all with views
    whose minor dims linearise against the flat planes:

    * all qubits >= lane ("row-only"): per-ROW shear vectors (R, 1)
      gathered in-graph from the 2^m tables, view (R, 128);
    * all qubits < lane+3 ("low"): (1, 8, 128) broadcast tables on an
      (A, 8, 128) view;
    * exactly one lane qubit + any row qubits: factored into an
      unmasked and a lane-masked row-gathered rotation (2 passes);
    * exactly one high qubit (>= lane+3) + any low qubits: the mirror
      factoring with broadcast tables, second pass row-masked.

    Falls back to the direct broadcast path for shapes outside these
    (the scheduler's merge partition guarantees they don't occur).
    """
    import jax.numpy as jnp

    lane = _lane_width(re.size, lane_bits)
    qubits = tuple(qubits)
    sign, t, si = _shear_tables(d)
    need_sign = bool((sign < 0).any())
    if not (np.any(t != 0.0) or np.any(si != 0.0)):
        if not need_sign:
            return re, im
    fdt = np.dtype(re.dtype)
    m = len(qubits)
    N = re.size
    R = N >> lane

    if all(q >= lane for q in qubits):
        return _row_gather_shear(re, im, qubits, d, lane, fdt)

    if all(q < lane + 3 for q in qubits):
        # bits [0, lane+3): tables over (8 row values, 2^lane lanes)
        return _low_table_shear(re, im, qubits, d, lane, fdt)

    if sum(q < lane for q in qubits) == 1:
        # ONE lane bit + any row bits: factor the joint phase into two
        # per-row rotations, the second masked to the l==1 lanes —
        # rotation(theta(h,l)) = rot(theta(h,0)) o rot(dtheta(h)*[l]).
        # Both factors use (R,1)- and trailing-lane broadcasts, the
        # shapes XLA fuses (a (1,2,1,128) middle-axis broadcast was
        # MATERIALIZED at 4 GiB each and OOM'd the n=30 compile).
        # Collapses e.g. a QFT target-j<7 CR run (one lane control,
        # many row phases) from per-gate passes to <= 2 passes.
        ql = next(q for q in qubits if q < lane)
        H = tuple(q for q in qubits if q >= lane)
        pos = {q: m - 1 - j for j, q in enumerate(qubits)}
        dd = np.asarray(d, dtype=np.complex128)
        if dd.ndim == 2:
            dd = np.diag(dd)

        hpat = np.arange(1 << len(H))
        idx0 = np.zeros_like(hpat)
        for j, q in enumerate(H):
            idx0 |= ((hpat >> (len(H) - 1 - j)) & 1) << pos[q]
        dA = dd[idx0]
        dB = dd[idx0 | (1 << pos[ql])] / dA
        re, im = _row_gather_shear(re, im, H, dA, lane, fdt)
        return _row_gather_shear(re, im, H, dB, lane, fdt,
                                 lane_mask_bit=ql)

    if sum(q >= lane + 3 for q in qubits) == 1:
        # ONE high bit + any low bits (the mirror factoring): tables
        # over the low set, the second pass masked to the h==1 rows.
        # Collapses a QFT target-j>=10 CR run over lane controls.
        qh = next(q for q in qubits if q >= lane + 3)
        L = tuple(q for q in qubits if q < lane + 3)
        pos = {q: m - 1 - j for j, q in enumerate(qubits)}
        dd = np.asarray(d, dtype=np.complex128)
        if dd.ndim == 2:
            dd = np.diag(dd)

        lpat = np.arange(1 << len(L))
        idx0 = np.zeros_like(lpat)
        for j, q in enumerate(L):
            idx0 |= ((lpat >> (len(L) - 1 - j)) & 1) << pos[q]
        dA = dd[idx0]
        dB = dd[idx0 | (1 << pos[qh])] / dA
        re, im = _low_table_shear(re, im, L, dA, lane, fdt)
        return _low_table_shear(re, im, L, dB, lane, fdt, row_mask_bit=qh)

    # General mixed shape (shouldn't be emitted at capacity): direct.
    return apply_diag_planar(re, im, qubits, np.asarray(d))


def _diag_bcast_planes(size, qubits, U, lane, fdtype):
    """(Pr, Pi, view_shape) constants for a planar diagonal broadcast.

    ``U`` may be the 2^m x 2^m matrix or (preferred, O(2^m)) the bare
    diagonal vector.
    """
    m = len(qubits)
    d = np.asarray(U, dtype=np.complex128)
    if d.ndim == 2:
        d = np.diag(d)
    low = [q for q in qubits if q < lane]
    high = sorted((q for q in qubits if q >= lane), reverse=True)

    shape: list[int] = []
    gate_axis: list[bool] = []
    prev = int(np.log2(size))
    for q in high:
        shape.extend([1 << (prev - q - 1), 2])
        gate_axis.extend([False, True])
        prev = q
    trailing = 1 << prev
    lane_dim = 1 << lane
    if low:
        shape.extend([trailing // lane_dim, lane_dim])
        gate_axis.extend([False, False])
        last_dim = lane_dim
    else:
        shape.append(trailing)
        gate_axis.append(False)
        last_dim = 1

    p_shape = [(2 if g else 1) for g in gate_axis]
    p_shape[-1] = last_dim
    P = np.zeros(p_shape, dtype=np.complex128)
    lanes = np.arange(last_dim)
    for t in range(1 << len(high)):
        bits = tuple((t >> (len(high) - 1 - j)) & 1 for j in range(len(high)))
        sub = np.zeros(last_dim, dtype=np.int64)
        for j, q in enumerate(qubits):
            if q < lane:
                sub |= ((lanes >> q) & 1) << (m - 1 - j)
            else:
                sub |= bits[high.index(q)] << (m - 1 - j)
        idx: list = []
        hj = 0
        for g in gate_axis[:-1]:
            if g:
                idx.append(bits[hj])
                hj += 1
            else:
                idx.append(0)
        P[tuple(idx)] = d[sub]
    Pr = jnp.asarray(np.real(P).astype(fdtype))
    Pi_np = np.imag(P).astype(fdtype)
    Pi = jnp.asarray(Pi_np) if Pi_np.any() else None
    return Pr, Pi, shape
