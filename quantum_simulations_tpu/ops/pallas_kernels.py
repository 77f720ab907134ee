"""Pallas TPU kernels for the hot panel ops (planar f32 representation).

The statevector's complex64 amplitudes are held as two f32 planes
(re, im) — the friendliest layout for Mosaic — and the rotating-panel
schedule's hot op becomes ONE kernel: load a (BR, 128) tile of each
plane into VMEM, run the four real 128x128 MXU matmuls of the complex
panel product, and (optionally) write the result to the bit-rotated
destination — fusing the panel matmul and the rotation transpose into
a single HBM pass.

Equivalent reference tier: the AVX-512 gate functors + gather/scatter
loops of ``hisvsim_repo/basic_gates.hpp`` / ``loop.hpp`` — here the
systolic array does the math and the kernel grid does the tiling.

All kernels run under ``interpret=True`` on CPU for the test suite.
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# The panels are MXU-BOUND at HIGHEST precision, not HBM-bound:
# measured 30 TFLOP/s on v5e (the bf16_3x ceiling), so a pass costs
# ~6.8 ms at n=28 vs the 5.24 ms bandwidth floor.  A manual hi/lo-bf16
# 3-product split (same arithmetic, explicit) raced SLOWER (0.159 vs
# 0.144 s nonstab28) and 100x less accurate per product — HIGHEST is
# already the precision-constrained speed of light here; Mosaic
# rejects Precision.HIGH inside kernels, and 1-pass bf16 (DEFAULT)
# loses 15 mantissa bits.  Do not re-race.
HI = jax.lax.Precision.HIGHEST
_DN = (((1,), (1,)), ((), ()))  # contract dim1 x dim1: a @ b.T

# Complex panel products via the Gauss 3-multiplication identity:
#   (re + i*im)(wr + i*wi):  m1 = re*wr, m2 = im*wi, t = (re+im)(wr+wi)
#   out_re = m1 - m2, out_im = t - m1 - m2
# One fewer MXU matmul per complex product (the panel kernels are
# MXU-compute-bound at f32/HIGHEST, not HBM-bound — measured 8.9 ms vs
# the 4.9 ms bandwidth floor per n=28 pass), for a ~25% pass-time cut.
# The extra adds are VPU-trivial.  Error stays at the f32 round-off
# scale (|t| <= 2*max|m|, same cancellation class as the direct form).
# QST_PANEL_GAUSS=0 restores the 4-matmul form for A/B racing.
_GAUSS = __import__("os").environ.get("QST_PANEL_GAUSS", "1") != "0"


def _pe(x):
    """Accumulation dtype for panel matmuls (f32 even for bf16 inputs)."""
    return jnp.float64 if x.dtype == jnp.float64 else jnp.float32


def _cmul_planes(mm, re, im, wr, wi):
    """(out_re, out_im) of the complex product via mm(a, b) matmuls."""
    if _GAUSS:
        m1 = mm(re, wr)
        m2 = mm(im, wi)
        t = mm(re + im, wr + wi)
        return m1 - m2, t - m1 - m2
    return mm(re, wr) - mm(im, wi), mm(re, wi) + mm(im, wr)


def _w_planes(W, fdtype):
    """Normalize a panel unitary to (wr, wi) planes.

    Accepts a numpy matrix (baked as literals) or a traced
    (wr, wi) tuple from ``dense.compose_low_panel_traced`` (tiny
    literals + in-graph composition; preferred for program size).
    """
    if isinstance(W, tuple):
        return W
    wr = np.ascontiguousarray(np.asarray(W).real, dtype=fdtype)
    wi = np.ascontiguousarray(np.asarray(W).imag, dtype=fdtype)
    return jnp.asarray(wr), jnp.asarray(wi)


def _block_rows(R: int, target: int = 1024) -> int:
    br = min(target, R)
    while R % br:
        br //= 2
    return max(br, 1)


def _rotate_by_theta(o_re, o_im, th):
    c = jnp.cos(th)
    s = jnp.sin(th)
    return o_re * c - o_im * s, o_re * s + o_im * c


def _panel_kernel(*refs, rotate: bool, dspec=None):
    if dspec is None:
        re_ref, im_ref, wr_ref, wi_ref, ore_ref, oim_ref = refs
    else:
        (re_ref, im_ref, wr_ref, wi_ref, a_ref, m_ref,
         ore_ref, oim_ref) = refs
    re = re_ref[:]
    im = im_ref[:]
    wr = wr_ref[:]
    wi = wi_ref[:]

    def mm(x, w):
        return jax.lax.dot_general(x, w, _DN, precision=HI,
                                   preferred_element_type=_pe(x))

    o_re, o_im = _cmul_planes(mm, re, im, wr, wi)
    if dspec is not None:
        # Fused diag epilogue: the merged run following this panel
        # rotates the output block in-VMEM — the diag's own HBM pass
        # disappears, and its cos/sin rides the panel's idle VPU.
        th = _theta_matmul(a_ref, m_ref, dspec, o_re.dtype).reshape(
            o_re.shape)
        o_re, o_im = _rotate_by_theta(o_re, o_im, th)
    if rotate:
        ore_ref[:] = o_re.T
        oim_ref[:] = o_im.T
    else:
        ore_ref[:] = o_re
        oim_ref[:] = o_im


def _panel_diag_plan(diag_terms, row_bit_of, grid_bit_of, n_rows, fdtype):
    """Plan the fused diag epilogue for a panel geometry (or None)."""
    if diag_terms is None:
        return None
    from .diag_plan import plan_diag_matmul

    plan = plan_diag_matmul(diag_terms, row_bit_of, grid_bit_of, n_rows)
    if plan is None:
        return None
    A, M, s_spec = plan
    return jnp.asarray(A, fdtype), jnp.asarray(M, fdtype), s_spec


def panel_apply_planar(
    re: jnp.ndarray,
    im: jnp.ndarray,
    W: np.ndarray,
    *,
    rotate: bool = False,
    block_rows: int = 1024,
    interpret: bool = False,
    inplace: bool = False,
    diag_terms=None,
):
    """Apply a 2^w-wide fused panel to planar f32 state (flat arrays).

    ``rotate=True`` additionally rotates index bits right by w (the
    panel scheduler's stage transition) inside the same pass: the
    output tile is written transposed, so the flat result is already
    in rotated order.

    ``inplace=True`` aliases the input planes to the output planes
    (``input_output_aliases``) so the update costs ZERO extra HBM —
    the n=30 single-chip enabler (2x 4 GiB planes + 2x out would blow
    a 16 GiB chip).  Only valid without rotation (the transposed write
    pattern would race the in-block reads).
    """
    wr, wi = _w_planes(W, re.dtype)
    dim = wr.shape[0]
    N = re.size
    R = N // dim
    # Wide panels (dim > 128, the lane-straddler path) must shrink the
    # row block to keep 4 live blocks + the W planes inside scoped VMEM.
    BR = _block_rows(R, min(block_rows, max(8, (1 << 17) // dim)))
    fdtype = re.dtype

    dplan = None
    if diag_terms is not None and dim == 128 and not rotate:
        split = 7 + (BR.bit_length() - 1)
        dplan = _panel_diag_plan(
            diag_terms,
            {q: q - 7 for q in range(7, split)},
            {q: (0, q - split) for q in range(split, 64)},
            BR, fdtype)
    if diag_terms is not None and dplan is None:
        # Unfusable (wide/rotating panel or column overflow): panel
        # pass then the standalone one-pass diag kernel.
        re, im = panel_apply_planar(
            re, im, W, rotate=rotate, block_rows=block_rows,
            interpret=interpret, inplace=inplace)
        return fused_diag_planar(re, im, diag_terms,
                                 interpret=interpret, inplace=inplace)

    kern = functools.partial(_panel_kernel, rotate=rotate,
                             dspec=None if dplan is None else dplan[2])
    if rotate:
        out_specs = [
            pl.BlockSpec((dim, BR), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, BR), lambda i: (0, i), memory_space=pltpu.VMEM),
        ]
        out_shape = [jax.ShapeDtypeStruct((dim, R), fdtype)] * 2
    else:
        out_specs = [
            pl.BlockSpec((BR, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        out_shape = [jax.ShapeDtypeStruct((R, dim), fdtype)] * 2

    assert not (inplace and rotate), "in-place panel cannot rotate"
    in_specs = [
        pl.BlockSpec((BR, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((BR, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((dim, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((dim, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [re.reshape(R, dim), im.reshape(R, dim), wr, wi]
    if dplan is not None:
        Amat, Mmat = dplan[0], dplan[1]
        in_specs.append(pl.BlockSpec(Amat.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(Mmat.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.extend([Amat, Mmat])
    ore, oim = pl.pallas_call(
        kern,
        grid=(R // BR,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={0: 0, 1: 1} if inplace else {},
        interpret=interpret,
    )(*operands)
    return ore.reshape(N), oim.reshape(N)


def _straddle_plan(qb: int, U, fdtype):
    """Static plan for a (6, qb in 7..13) straddler prologue.

    ``out[p] = sum_k C_k[p] * x[p ^ flips_k]`` over the <= 4 flip
    patterns of the two bits, with (128, 128) coefficient planes
    ``C_k[p] = U[b(p), b(p)^k]`` (b = 2*x_lane6 + x_dbit).  Zero terms
    are elided HERE (statically) — a CNOT reduces to two
    mask-multiplies and one sublane-pair flip.  Returns
    ``(creal, cimag | None, meta)`` where the planes are passed as
    pallas INPUTS (kernels cannot capture array constants) and
    ``meta = (qb, ks, kinds, has_imag)`` drives the kernel trace.
    """
    dbit = qb - 7
    d0 = (np.arange(128) >> dbit) & 1          # row -> d-bit value
    l6 = (np.arange(128) >> 6) & 1             # lane -> bit-6 value
    b = 2 * l6[None, :] + d0[:, None]          # (128, 128) block ids
    Un = np.asarray(U, np.complex128)
    ks, kinds, crs, cis = [], [], [], []
    has_imag = False
    npdt = np.dtype(jnp.dtype(fdtype).name)
    planes = {}
    for k in range(4):
        C = Un[b, b ^ k]
        if not C.any():
            continue
        planes[k] = C
        ks.append(k)
        if np.allclose(C.imag, 0.0):
            kinds.append("unit" if np.allclose(C.real, 1.0) else "real")
        else:
            kinds.append("complex")
            has_imag = True
        crs.append(C.real.astype(npdt))
        cis.append(C.imag.astype(npdt))
    # Permutation-like fast path (CNOT & friends): exactly two terms
    # whose 0/1 masks tile the block -> ONE select per plane instead
    # of two multiplies + add (the VPU prologue serializes with the
    # MXU contractions, so every elided block op is wall time).
    if (len(ks) == 2 and ks[0] == 0
            and all(np.allclose(planes[k].imag, 0) for k in ks)
            and all(np.isin(planes[k].real, (0.0, 1.0)).all() for k in ks)
            and np.allclose(planes[ks[0]].real + planes[ks[1]].real, 1.0)):
        mask = planes[ks[1]].real.astype(npdt)  # 1 -> take flipped term
        return mask[None], None, (qb, (ks[1],), ("select",), False)
    creal = np.stack(crs)
    cimag = np.stack(cis) if has_imag else None
    return creal, cimag, (qb, tuple(ks), tuple(kinds), has_imag)


def _straddle_prologue(o_re, o_im, meta, creal_ref, cimag_ref,
                       interpret: bool):
    """Apply the planned straddler gate to a VMEM block (BA, 128, 128).

    The (6, qb) pair fits no window (``panelize._fit_start`` forbidden
    zone) so it otherwise costs a dedicated full-state pass — but in a
    dual-panel block BOTH its bits are VMEM-resident, so the gate
    rides the panel pass as a VPU prologue (zero extra HBM traffic).
    """
    qb, ks, kinds, has_imag = meta
    BA = o_re.shape[0]
    dbit = qb - 7
    hi, lo = 128 >> (dbit + 1), 1 << dbit

    def flip_d(x):
        # XOR of d-bit `dbit`: swap the two halves of the size-2 axis.
        # (A ::-1 rev lowers to the `rev` primitive, which Mosaic does
        # not implement — slice + concatenate does.)
        v = x.reshape(BA, hi, 2, lo, 128)
        v = jnp.concatenate([v[:, :, 1:2], v[:, :, 0:1]], axis=2)
        return v.reshape(x.shape)

    def flip_l6(x):
        # lane XOR 64 == cyclic roll by 64 on the 128-lane axis
        if interpret:
            return jnp.roll(x, 64, axis=-1)
        return pltpu.roll(x, 64, axis=x.ndim - 1)

    cache = {0: (o_re, o_im)}

    def term(k):  # k bit0 = d flip, bit1 = lane-6 flip
        if k in cache:
            return cache[k]
        if k & 2 and 2 not in cache:
            cache[2] = (flip_l6(o_re), flip_l6(o_im))
        xr, xi = cache[2] if k & 2 else cache[0]
        if k & 1:
            xr, xi = flip_d(xr), flip_d(xi)
        cache[k] = (xr, xi)
        return cache[k]

    if kinds == ("select",):
        # Permutation-like gate: out = where(mask, flipped, x).
        sel = creal_ref[0] > 0.5
        tr, ti = term(ks[0])
        return jnp.where(sel, tr, o_re), jnp.where(sel, ti, o_im)

    acc_r = acc_i = None
    for t, (k, kind) in enumerate(zip(ks, kinds)):
        tr, ti = term(k)
        if kind == "unit":
            pr, pi = tr, ti
        elif kind == "real":
            Cr = creal_ref[t]
            pr, pi = tr * Cr, ti * Cr
        else:
            Cr = creal_ref[t]
            Ci = cimag_ref[t]
            pr = tr * Cr - ti * Ci
            pi = ti * Cr + tr * Ci
        acc_r = pr if acc_r is None else acc_r + pr
        acc_i = pi if acc_i is None else acc_i + pi
    return acc_r, acc_i


def _dual_panel_kernel(*refs, modes, dspec=None, smeta_pre=None,
                       smeta_post=None, interpret=False):
    # Two panel contractions in ONE HBM pass on block (BA, 128, 128):
    # 'full' contracts axis 1 (the pos-7 window), 'lane' the trailing
    # lane axis (the pos-0 window) — the second contraction rides the
    # first's read+write.  Optional straddler-gate prologue/epilogue
    # (circuit-order BEFORE/AFTER both panels) runs in VMEM around the
    # contractions; the merged-diag epilogue (dspec) stays LAST
    # (circuit order: [pre] panels [post] [diag]).
    # Inputs: re, im, w1r, w1i, w2r, w2i [, a, m]
    #         [, pre_creal[, pre_cimag]][, post_creal[, post_cimag]].
    def nplanes(m):
        return 0 if m is None else (2 if m[3] else 1)

    n_in = (6 + (2 if dspec is not None else 0)
            + nplanes(smeta_pre) + nplanes(smeta_post))
    ins, (ore_ref, oim_ref) = refs[:n_in], refs[n_in:]
    re_ref, im_ref, w1r_ref, w1i_ref, w2r_ref, w2i_ref = ins[:6]
    p = 6
    if dspec is not None:
        a_ref, m_ref = ins[6:8]
        p = 8
    o_re = re_ref[:]
    o_im = im_ref[:]
    if smeta_pre is not None:
        cre = ins[p]
        cim = ins[p + 1] if smeta_pre[3] else None
        p += nplanes(smeta_pre)
        o_re, o_im = _straddle_prologue(o_re, o_im, smeta_pre, cre,
                                        cim, interpret)

    for mode, wrr, wir in zip(modes, (w1r_ref, w2r_ref),
                              (w1i_ref, w2i_ref)):
        wr = wrr[:]
        wi = wir[:]
        if mode == "full":
            def mm(x, w):
                return jnp.einsum("ij,ajk->aik", w, x, precision=HI,
                                  preferred_element_type=_pe(x))
        else:  # 'lane'
            def mm(x, w):
                return jnp.einsum("adm,lm->adl", x, w, precision=HI,
                                  preferred_element_type=_pe(x))
        o_re, o_im = _cmul_planes(mm, o_re, o_im, wr, wi)

    if smeta_post is not None:
        cre = ins[p]
        cim = ins[p + 1] if smeta_post[3] else None
        o_re, o_im = _straddle_prologue(o_re, o_im, smeta_post, cre,
                                        cim, interpret)
    if dspec is not None:
        th = _theta_matmul(a_ref, m_ref, dspec, o_re.dtype).reshape(
            o_re.shape)
        o_re, o_im = _rotate_by_theta(o_re, o_im, th)
    ore_ref[:] = o_re
    oim_ref[:] = o_im


def dual_panel_supported(p1: int, p2: int) -> bool:
    # (0,8)/(7,8) raced SLOWER fused: the pos-8 operator must expand
    # to kron(W, I2) (2x MXU flops) and panels are MXU-bound — e.g.
    # dual@8+7 19.2 ms vs 16.6 separate at n=28.  Only (0,7), whose
    # two contractions are both plain 128-wide, wins (12.8 vs 13.6).
    return {p1, p2} == {0, 7}


def dual_panel_planar(
    re: jnp.ndarray,
    im: jnp.ndarray,
    W1: np.ndarray,
    p1: int,
    W2: np.ndarray,
    p2: int,
    *,
    interpret: bool = False,
    inplace: bool = False,
    block_elems: int | None = None,
    diag_terms=None,
    straddle=None,
    post_straddle=None,
):
    """Apply panel W1@p1 then W2@p2 in ONE HBM pass.

    Only the (0, 7) pair is supported: its two contractions (lane
    axis + row axis of the (A, 128, 128) view) are both plain
    128-wide matmuls, so the fused pass reads/writes once while the
    MXU work merely sums — measured 12.8 ms vs 13.6 separate at n=28
    (panels are MXU-bound; see dual_panel_supported for the rejected
    wider pairs).  An optional merged-diag epilogue (``diag_terms``)
    rides the same pass, and an optional forbidden-zone straddler
    gate ``straddle=(qa=6, qb in 7..13, U4)`` (circuit-order BEFORE
    the panels) runs as a VPU prologue — its standalone full-state
    pass disappears (``panelize._fold_straddlers``).
    """
    assert dual_panel_supported(p1, p2), (p1, p2)
    D = 128
    N = re.size
    A = N // (D * 128)
    fdtype = re.dtype
    if A == 0:  # tiny states: two passes (tests at n < 15)
        from . import dense as _dense

        def strad(re, im, s):
            qb, U4 = s[1], s[2]
            out = _dense.apply_gate_planar(re, im, (6, qb), U4)
            if out is None:  # generic complex fallback (tiny only)
                cdt = (jnp.complex128 if fdtype == jnp.float64
                       else jnp.complex64)
                psi = _dense.apply_gate(from_planar(re, im, cdt),
                                        (6, qb), jnp.asarray(U4))
                out = to_planar(psi)
            return out

        if straddle is not None:
            re, im = strad(re, im, straddle)

        def one(re, im, W, p, dt):
            if p == 0:
                return panel_apply_planar(re, im, W, interpret=interpret,
                                          inplace=inplace, diag_terms=dt)
            return positioned_panel_planar(re, im, W, p,
                                           interpret=interpret,
                                           inplace=inplace, diag_terms=dt)
        re, im = one(re, im, W1, p1, None)
        if post_straddle is None:
            return one(re, im, W2, p2, diag_terms)
        re, im = one(re, im, W2, p2, None)
        re, im = strad(re, im, post_straddle)
        if diag_terms is not None:
            re, im = _dense.apply_diag_terms_planar(re, im, diag_terms)
        return re, im

    def prep(W, p):
        Wn = np.asarray(W)
        assert Wn.shape[0] == 128, "dual panel needs 128-wide operators"
        return ("lane" if p == 0 else "full"), Wn

    m1, U1 = prep(W1, p1)
    m2, U2 = prep(W2, p2)
    w1r, w1i = _w_planes(U1, fdtype)
    w2r, w2i = _w_planes(U2, fdtype)

    be = block_elems if block_elems is not None else 1 << 17
    BA = max(1, be // (D * 128))
    while A % BA:
        BA //= 2

    dplan = None
    if diag_terms is not None:
        split = 7 + (BA * D).bit_length() - 1  # in-block bits [7, split)
        dplan = _panel_diag_plan(
            diag_terms,
            {q: q - 7 for q in range(7, split)},
            {q: (0, q - split) for q in range(split, 64)},
            BA * D, fdtype)
        if dplan is None:
            re, im = dual_panel_planar(
                re, im, W1, p1, W2, p2, interpret=interpret,
                inplace=inplace, block_elems=block_elems,
                straddle=straddle, post_straddle=post_straddle)
            return fused_diag_planar(re, im, diag_terms,
                                     interpret=interpret, inplace=inplace)

    spec = pl.BlockSpec((BA, D, 128), lambda a: (a, 0, 0),
                        memory_space=pltpu.VMEM)

    def wspec(w):
        return pl.BlockSpec(w.shape, lambda a: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [spec, spec, wspec(w1r), wspec(w1i), wspec(w2r),
                wspec(w2i)]
    operands = [re.reshape(A, D, 128), im.reshape(A, D, 128),
                w1r, w1i, w2r, w2i]
    if dplan is not None:
        in_specs += [pl.BlockSpec(dplan[0].shape, lambda a: (0, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec(dplan[1].shape, lambda a: (0, 0),
                                  memory_space=pltpu.VMEM)]
        operands += [dplan[0], dplan[1]]
    smeta_pre = smeta_post = None

    def add_straddle(s):
        creal, cimag, meta = _straddle_plan(s[1], s[2], fdtype)
        for c in (creal,) + ((cimag,) if cimag is not None else ()):
            in_specs.append(pl.BlockSpec(
                c.shape, lambda a: (0, 0, 0), memory_space=pltpu.VMEM))
            operands.append(c)
        return meta

    if straddle is not None:
        smeta_pre = add_straddle(straddle)
    if post_straddle is not None:
        smeta_post = add_straddle(post_straddle)
    kern = functools.partial(
        _dual_panel_kernel, modes=(m1, m2),
        dspec=None if dplan is None else dplan[2],
        smeta_pre=smeta_pre, smeta_post=smeta_post, interpret=interpret)
    ore, oim = pl.pallas_call(
        kern,
        grid=(A // BA,),
        in_specs=in_specs,
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((A, D, 128), fdtype)] * 2,
        input_output_aliases={0: 0, 1: 1} if inplace else {},
        interpret=interpret,
    )(*operands)
    return ore.reshape(N), oim.reshape(N)


def _positioned_row_kernel(*refs, e=0, dspec=None):
    if dspec is None:
        re_ref, im_ref, wr_ref, wi_ref, ore_ref, oim_ref = refs
    else:
        (re_ref, im_ref, wr_ref, wi_ref, a_ref, m_ref,
         ore_ref, oim_ref) = refs
    # Blocks (BA, D2, 128) with D2 = dim*2^e (pos 7..9).  The expanded
    # D2 x D2 operator is perm(W (x) I_2^e) — contracting it densely
    # costs 2^e times the flops and measured 250 GB/s at e=1 vs 497 at
    # e=0 (compute-bound).  Instead reshape the VALUE so the low e row
    # bits become a loop axis and contract only the dim-wide panel
    # axis (W itself) per slice.
    wr = wr_ref[:]
    wi = wi_ref[:]
    dim = wr.shape[0]

    def mm(x, w):
        return jnp.einsum("ij,ajk->aik", w, x, precision=HI,
                          preferred_element_type=_pe(x))

    if e == 0:
        re = re_ref[:]
        im = im_ref[:]
        o_re, o_im = _cmul_planes(mm, re, im, wr, wi)
        if dspec is not None:
            th = _theta_matmul(a_ref, m_ref, dspec, o_re.dtype).reshape(
                o_re.shape)
            o_re, o_im = _rotate_by_theta(o_re, o_im, th)
        ore_ref[:], oim_ref[:] = o_re, o_im
        return

    ba = re_ref.shape[0]
    view = (ba, dim, 1 << e, 128)
    vre = re_ref[:].reshape(view)
    vim = im_ref[:].reshape(view)
    out_r = []
    out_i = []
    for b in range(1 << e):
        o_re, o_im = _cmul_planes(
            mm, vre[:, :, b, :], vim[:, :, b, :], wr, wi)
        out_r.append(o_re)
        out_i.append(o_im)
    shape = re_ref.shape
    o_re = jnp.stack(out_r, axis=2).reshape(shape)
    o_im = jnp.stack(out_i, axis=2).reshape(shape)
    if dspec is not None:
        th = _theta_matmul(a_ref, m_ref, dspec, o_re.dtype).reshape(shape)
        o_re, o_im = _rotate_by_theta(o_re, o_im, th)
    ore_ref[:] = o_re
    oim_ref[:] = o_im


def _positioned_4d_kernel(*refs, BB, dspec=None):
    # Blocks (BA, 128, BB, 128): contract axis 1 (the panel subspace)
    # with W (pos >= 10).  Unrolled loop over the b axis keeps every
    # contraction in the known-good (BA, dim, lanes) 3-D form.
    if dspec is None:
        re_ref, im_ref, wr_ref, wi_ref, ore_ref, oim_ref = refs
    else:
        (re_ref, im_ref, wr_ref, wi_ref, a_ref, m_ref,
         ore_ref, oim_ref) = refs
    wr = wr_ref[:]
    wi = wi_ref[:]

    def mm(x, w):
        return jnp.einsum("ij,ajk->aik", w, x, precision=HI,
                          preferred_element_type=_pe(x))

    th4 = None
    if dspec is not None:
        th4 = _theta_matmul(a_ref, m_ref, dspec, wr.dtype).reshape(
            re_ref.shape)
    for b in range(BB):
        o_re, o_im = _cmul_planes(
            mm, re_ref[:, :, b, :], im_ref[:, :, b, :], wr, wi)
        if th4 is not None:
            o_re, o_im = _rotate_by_theta(o_re, o_im, th4[:, :, b, :])
        ore_ref[:, :, b, :] = o_re
        oim_ref[:, :, b, :] = o_im




def positioned_panel_planar(
    re: jnp.ndarray,
    im: jnp.ndarray,
    W: np.ndarray,
    pos: int,
    *,
    col_block: int = 512,
    batch_block: int = 8,
    interpret: bool = False,
    inplace: bool = False,
    block_elems: int | None = None,
    diag_terms=None,
):
    """Apply a 2^w-wide fused panel to bit window [pos, pos+w) — no rotation.

    The state is viewed as (A, 2^w, 2^pos); each kernel instance
    multiplies a (BA, 2^w, CB) block by W on the MXU (batched einsum —
    measured 530 GB/s on v5e vs 285 GB/s for single-row blocks).
    Requires pos >= 7 so the trailing dim keeps full lanes (pos == 0 is
    the plain lane panel, :func:`panel_apply_planar`).

    Fixed-window scheduling with positioned panels eliminates the
    rotation transposes of the sliding schedule entirely.
    """
    wr, wi = _w_planes(W, re.dtype)
    dim = wr.shape[0]
    N = re.size
    assert pos >= 7 or interpret, "positioned panel needs pos >= 7 on TPU"
    fdtype = re.dtype
    alias = {0: 0, 1: 1} if inplace else {}

    # LAYOUT RULE (the n=30 capacity lesson): every operand view must
    # be a pure bitcast of the flat planes — any view whose minor-two
    # dims don't linearise as (mult-of-8, 128) makes XLA materialise a
    # RETILING COPY of the whole plane (4 GiB at n=30; two copies +
    # the aliased planes OOM a 16 GiB chip).  (X, 128) and
    # (..., X, 128) with X % 8 == 0 are exactly the linear-safe views.
    lanes = 128
    e = pos - 7  # panel bits sit at row-bits [e, e+w) of the (R,128) view

    if diag_terms is not None and (not isinstance(W, tuple)
                                   and dim != lanes):
        # Ragged panels can't host the epilogue: two passes.
        re, im = positioned_panel_planar(
            re, im, W, pos, col_block=col_block, batch_block=batch_block,
            interpret=interpret, inplace=inplace, block_elems=block_elems)
        return fused_diag_planar(re, im, diag_terms,
                                 interpret=interpret, inplace=inplace)

    if not isinstance(W, tuple) and dim != lanes:
        # Non-128 panels (ragged width) keep the legacy 3-D path; they
        # only occur off the capacity tier.
        C = 1 << pos
        A = N // (dim * C)
        CB = min(C, max(128, (1 << 17) // dim))
        BA = 1
        kern = _positioned_row_kernel
        spec = pl.BlockSpec((BA, dim, CB), lambda a, c: (a, 0, c),
                            memory_space=pltpu.VMEM)
        wspec = pl.BlockSpec((dim, dim), lambda a, c: (0, 0),
                             memory_space=pltpu.VMEM)
        ore, oim = pl.pallas_call(
            kern,
            grid=(A, C // CB),
            in_specs=[spec, spec, wspec, wspec],
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((A, dim, C), fdtype)] * 2,
            input_output_aliases=alias,
            interpret=interpret,
        )(re.reshape(A, dim, C), im.reshape(A, dim, C), wr, wi)
        return ore.reshape(N), oim.reshape(N)

    if e < 3:
        # pos 7..9: view (A2, D2 = dim*2^e, 128) is linear-safe
        # (D2 % 8 == 0); the kernel loops the 2^e low row-bits and
        # contracts only the dim-wide panel axis.  (A "wide" variant
        # viewing (A2, dim, 2^e*128) and contracting in one einsum was
        # raced on v5e and LOST 2.7x — 278 vs 733 GB/s at pos 8: the
        # >128-lane trailing axis forces a relayout per vreg.  Keep
        # the loop kernel.)
        D2 = dim << e
        A2 = N // (D2 * lanes)
        # 1<<17-elem blocks raced best on v5e (pos7 502 vs 463 GB/s);
        # 1<<18 fails to compile at e == 0 (VMEM).
        be = block_elems if block_elems is not None else 1 << 17
        BA = max(1, be // (D2 * lanes))
        while A2 % BA:
            BA //= 2
        dplan = None
        if diag_terms is not None:
            split = 14 + e + (BA.bit_length() - 1)
            dplan = _panel_diag_plan(
                diag_terms,
                {q: q - 7 for q in range(7, split)},
                {q: (0, q - split) for q in range(split, 64)},
                BA * D2, fdtype)
            if dplan is None:
                re, im = positioned_panel_planar(
                    re, im, W, pos, interpret=interpret, inplace=inplace,
                    block_elems=block_elems)
                return fused_diag_planar(re, im, diag_terms,
                                         interpret=interpret,
                                         inplace=inplace)
        spec = pl.BlockSpec((BA, D2, lanes), lambda a: (a, 0, 0),
                            memory_space=pltpu.VMEM)
        wspec = pl.BlockSpec((dim, dim), lambda a: (0, 0),
                             memory_space=pltpu.VMEM)
        in_specs = [spec, spec, wspec, wspec]
        operands = [re.reshape(A2, D2, lanes), im.reshape(A2, D2, lanes),
                    wr, wi]
        if dplan is not None:
            in_specs += [
                pl.BlockSpec(dplan[0].shape, lambda a: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(dplan[1].shape, lambda a: (0, 0),
                             memory_space=pltpu.VMEM)]
            operands += [dplan[0], dplan[1]]
        ore, oim = pl.pallas_call(
            functools.partial(_positioned_row_kernel, e=e,
                              dspec=None if dplan is None else dplan[2]),
            grid=(A2 // BA,),
            in_specs=in_specs,
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((A2, D2, lanes), fdtype)] * 2,
            input_output_aliases=alias,
            interpret=interpret,
        )(*operands)
        return ore.reshape(N), oim.reshape(N)

    # pos >= 10: 4-D view (A2, 128, B2, 128) — linear-safe (B2 >= 8).
    B2 = 1 << e
    A2 = N // (dim * B2 * lanes)
    BB = min(B2, max(8, batch_block))
    while B2 % BB:
        BB //= 2
    # 1<<18-elem blocks raced best here (pos14 464 vs 442 GB/s); 1<<19
    # fails to compile (VMEM).
    be = block_elems if block_elems is not None else 1 << 18
    BA = max(1, be // (dim * BB * lanes))
    while A2 % BA:
        BA //= 2
    dplan = None
    if diag_terms is not None:
        lbb = BB.bit_length() - 1
        lba = BA.bit_length() - 1
        row_bit_of = {}
        for q in range(7, 7 + lbb):  # in-block b bits
            row_bit_of[q] = q - 7
        for q in range(pos, pos + 7):  # panel bits
            row_bit_of[q] = lbb + (q - pos)
        for q in range(pos + 7, pos + 7 + lba):  # in-block a bits
            row_bit_of[q] = lbb + 7 + (q - pos - 7)
        grid_bit_of = {}
        for q in range(7 + lbb, pos):  # grid axis 1 (b blocks)
            grid_bit_of[q] = (1, q - (7 + lbb))
        for q in range(pos + 7 + lba, 64):  # grid axis 0 (a blocks)
            grid_bit_of[q] = (0, q - (pos + 7 + lba))
        dplan = _panel_diag_plan(diag_terms, row_bit_of, grid_bit_of,
                                 BA * dim * BB, fdtype)
        if dplan is None:
            re, im = positioned_panel_planar(
                re, im, W, pos, batch_block=batch_block,
                interpret=interpret, inplace=inplace,
                block_elems=block_elems)
            return fused_diag_planar(re, im, diag_terms,
                                     interpret=interpret, inplace=inplace)
    spec = pl.BlockSpec((BA, dim, BB, lanes), lambda a, b: (a, 0, b, 0),
                        memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((dim, dim), lambda a, b: (0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [spec, spec, wspec, wspec]
    operands = [re.reshape(A2, dim, B2, lanes),
                im.reshape(A2, dim, B2, lanes), wr, wi]
    if dplan is not None:
        in_specs += [
            pl.BlockSpec(dplan[0].shape, lambda a, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(dplan[1].shape, lambda a, b: (0, 0),
                         memory_space=pltpu.VMEM)]
        operands += [dplan[0], dplan[1]]
    ore, oim = pl.pallas_call(
        functools.partial(_positioned_4d_kernel, BB=BB,
                          dspec=None if dplan is None else dplan[2]),
        grid=(A2 // BA, B2 // BB),
        in_specs=in_specs,
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((A2, dim, B2, lanes), fdtype)] * 2,
        input_output_aliases=alias,
        interpret=interpret,
    )(*operands)
    return ore.reshape(N), oim.reshape(N)


# ---------------------------------------------------------------------------
# Pair-update kernel: generic 2q gates on high (>= lane) qubit pairs
# ---------------------------------------------------------------------------
#
# A 2q gate on bits (hi, lo) couples the four amplitude planes selected
# by those bits.  The XLA formulations (slice+stack, flip+broadcast)
# measured ~6x off roofline — reverse ops defeat fusion — so window
# mode's straddling SWAPs/CNOTs were the dominant per-op cost
# (NOTES_ROUND1 item 1).  These kernels read each plane block once,
# form the four complex linear combinations in VMEM with structural
# zeros elided at trace time (CNOT/SWAP cost no multiplies), and write
# each output block once: one HBM pass at elementwise speed.
#
# TPU analogue of the reference's strided AVX-512 gate paths
# (hisvsim_repo/basic_gates.hpp:99-1300).
#
# Two layouts keep tiles clean (>= (8, 128)) across the bit range;
# straddlers always have span hi-lo >= 7, which guarantees B >= 64:
#  * lo in [7, 12]  — "column" kernel: view (A, 2, B, 2^(lo+1)); the
#    lo-bit halves are lane-aligned column ranges of one block, the hi
#    bit is a leading axis.
#  * lo >= 13       — "row" kernel: view (R, 2^c); both bits are row
#    bits; four input refs select the planes via block index maps and
#    the output-plane index is the innermost grid dim, so Mosaic holds
#    the same four input blocks across the four output steps.


def _pair_coeffs(U, qa: int, qb: int) -> np.ndarray:
    """C[ho, lo_, h, l] = <out plane (ho,lo_)| U |in plane (h,l)>.

    (h, l) are the values of the high/low *bit positions*; U is
    big-endian in gate-qubit order (qa = MSB), per the contract.
    """
    hi = max(qa, qb)

    def sub(h: int, l: int) -> int:
        return (h << 1) | l if qa == hi else (l << 1) | h

    u = np.asarray(U, dtype=np.complex128)
    C = np.zeros((2, 2, 2, 2), dtype=np.complex128)
    for ho in (0, 1):
        for lo_ in (0, 1):
            for h in (0, 1):
                for l in (0, 1):
                    C[ho, lo_, h, l] = u[sub(ho, lo_), sub(h, l)]
    return C


def _plane_lincomb(coeffs, planes, shape, fdtype):
    """sum(c * (xr + i xi)) with trace-time zero/one elision."""
    ar = ai = None

    def add(acc, t):
        return t if acc is None else acc + t

    for c, (xr, xi) in zip(coeffs, planes):
        cr, ci = float(np.real(c)), float(np.imag(c))
        if cr != 0.0:
            ar = add(ar, xr if cr == 1.0 else cr * xr)
            ai = add(ai, xi if cr == 1.0 else cr * xi)
        if ci != 0.0:
            ar = add(ar, (-ci) * xi)
            ai = add(ai, ci * xr)
    if ar is None:
        ar = jnp.zeros(shape, fdtype)
        ai = jnp.zeros(shape, fdtype)
    return ar, ai


def _pair_col_kernel(re_ref, im_ref, ore_ref, oim_ref, *, Clo, C):
    planes = {}
    for h in (0, 1):
        for l in (0, 1):
            sl = slice(l * Clo, (l + 1) * Clo)
            planes[(h, l)] = (re_ref[:, h, :, sl], im_ref[:, h, :, sl])
    keys = [(0, 0), (0, 1), (1, 0), (1, 1)]
    shape = planes[(0, 0)][0].shape
    for ho, lo_ in keys:
        ar, ai = _plane_lincomb(
            [C[ho, lo_, h, l] for h, l in keys],
            [planes[k] for k in keys], shape, re_ref.dtype)
        sl = slice(lo_ * Clo, (lo_ + 1) * Clo)
        ore_ref[:, ho, :, sl] = ar
        oim_ref[:, ho, :, sl] = ai


def _pair_row_kernel(*refs, C):
    in_refs, (ore_ref, oim_ref) = refs[:8], refs[8:]
    j = pl.program_id(3)
    keys = [(0, 0), (0, 1), (1, 0), (1, 1)]
    planes = [(in_refs[k][:], in_refs[4 + k][:]) for k in range(4)]
    shape = planes[0][0].shape

    def mk(ho, lo_):
        def f():
            return _plane_lincomb(
                [C[ho, lo_, h, l] for h, l in keys],
                planes, shape, in_refs[0].dtype)
        return f

    ar, ai = jax.lax.switch(j, [mk(*k) for k in keys])
    ore_ref[:] = ar
    oim_ref[:] = ai


PAIR_COL_MAX_LO = 12


def pair_update_supported(qa: int, qb: int, lane: int = 7) -> bool:
    hi, lo = max(qa, qb), min(qa, qb)
    if lo < lane:
        return False
    return lo >= 13 or hi >= lo + 4  # column kernel needs B >= 8


def _pair_row_inplace_kernel(re_ref, im_ref, ore_ref, oim_ref, *, C):
    # The (1, 2, 1, 2, BR, Cc) block holds ALL FOUR bit planes, so every
    # output write lands in the same grid step as its reads — aliasing
    # the in/out buffers is hazard-free (unlike the j-stepped variant,
    # which writes plane j while later steps still read it from HBM).
    keys = [(0, 0), (0, 1), (1, 0), (1, 1)]
    planes = [(re_ref[0, h, 0, l], im_ref[0, h, 0, l]) for h, l in keys]
    shape = planes[0][0].shape
    for ho, lo_ in keys:
        ar, ai = _plane_lincomb(
            [C[ho, lo_, h, l] for h, l in keys],
            planes, shape, re_ref.dtype)
        ore_ref[0, ho, 0, lo_] = ar
        oim_ref[0, ho, 0, lo_] = ai


def pair_update_planar(
    re: jnp.ndarray,
    im: jnp.ndarray,
    qa: int,
    qb: int,
    U: np.ndarray,
    *,
    interpret: bool = False,
    inplace: bool = False,
):
    """Apply a 4x4 unitary to high qubit pair (qa, qb) on f32 planes.

    One HBM pass (read once, write once); requires
    :func:`pair_update_supported`.  U is big-endian (qa = MSB).
    ``inplace`` aliases in->out planes (zero extra HBM; see
    :func:`panel_apply_planar`).
    """
    hi, lo = max(qa, qb), min(qa, qb)
    assert pair_update_supported(qa, qb), (qa, qb)
    C = _pair_coeffs(U, qa, qb)
    N = re.size
    fdtype = re.dtype

    # In-place mode always takes the canonical-lane ROW path (its view
    # is a bitcast; the column view retiles — fatal at n>=29).  It
    # needs T = 2^(lo-7) >= 8, i.e. lo >= 10.
    if inplace:
        assert lo >= 10, (qa, qb)
    if lo <= PAIR_COL_MAX_LO and not inplace:
        C2 = 1 << (lo + 1)
        Clo = 1 << lo
        B = 1 << (hi - lo - 1)
        A = N >> (hi + 1)
        BB = min(B, max(8, (1 << 16) // (2 * C2)))
        BA = min(A, max(1, (1 << 16) // (2 * BB * C2)))
        kern = functools.partial(_pair_col_kernel, Clo=Clo, C=C)
        spec = pl.BlockSpec((BA, 2, BB, C2), lambda a, b: (a, 0, b, 0),
                            memory_space=pltpu.VMEM)
        ore, oim = pl.pallas_call(
            kern,
            grid=(A // BA, B // BB),
            in_specs=[spec, spec],
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((A, 2, B, C2), fdtype)] * 2,
            input_output_aliases={0: 0, 1: 1} if inplace else {},
            interpret=interpret,
        )(re.reshape(A, 2, B, C2), im.reshape(A, 2, B, C2))
        return ore.reshape(N), oim.reshape(N)

    if inplace:
        # Canonical 128-lane columns: the (..., X, 128) view is a pure
        # bitcast of the flat planes (wider Cc retiles — fatal at the
        # n=30 capacity tier; see positioned_panel_planar).
        c = 7
        Cc = 1 << c
        BR = min(1 << (lo - c), max(8, (1 << 14) // Cc))
        A = N >> (hi + 1)
        Bp = 1 << (hi - lo - 1)
        T = (1 << (lo - c)) // BR
        view = (A, 2, Bp, 2, T * BR, Cc)
        spec = pl.BlockSpec((1, 2, 1, 2, BR, Cc),
                            lambda a, b, t: (a, 0, b, 0, t, 0),
                            memory_space=pltpu.VMEM)
        kern = functools.partial(_pair_row_inplace_kernel, C=C)
        ore, oim = pl.pallas_call(
            kern,
            grid=(A, Bp, T),
            in_specs=[spec, spec],
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct(view, fdtype)] * 2,
            input_output_aliases={0: 0, 1: 1},
            interpret=interpret,
        )(re.reshape(view), im.reshape(view))
        return ore.reshape(N), oim.reshape(N)

    # Row kernel: view (R, Cc); both gate bits are row-block index bits.
    c = min(lo - 3, 12)
    Cc = 1 << c
    BR = min(1 << (lo - c), max(8, (1 << 16) // Cc))
    A = N >> (hi + 1)
    Bp = 1 << (hi - lo - 1)
    T = (1 << (lo - c)) // BR
    R = N // Cc

    def in_map(h, l):
        return lambda a, b, t, j: ((((a * 2 + h) * Bp + b) * 2 + l) * T + t, 0)

    def out_map(a, b, t, j):
        return ((((a * 2 + j // 2) * Bp + b) * 2 + j % 2) * T + t, 0)

    in_specs = [
        pl.BlockSpec((BR, Cc), in_map(h, l), memory_space=pltpu.VMEM)
        for h in (0, 1) for l in (0, 1)
    ]
    in_specs = in_specs + in_specs  # re planes then im planes
    out_spec = pl.BlockSpec((BR, Cc), out_map, memory_space=pltpu.VMEM)
    kern = functools.partial(_pair_row_kernel, C=C)
    xr = re.reshape(R, Cc)
    xi = im.reshape(R, Cc)
    ore, oim = pl.pallas_call(
        kern,
        grid=(A, Bp, T, 4),
        in_specs=in_specs,
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((R, Cc), fdtype)] * 2,
        interpret=interpret,
    )(xr, xr, xr, xr, xi, xi, xi, xi)
    return ore.reshape(N), oim.reshape(N)


# ---------------------------------------------------------------------------
# Mixed-pair kernel: 2q gates with one lane qubit (< 7) and one high qubit
# ---------------------------------------------------------------------------
#
# The complex mixed path (plane decomposition + XLA lane matmuls)
# measured 13-22 ms per gate at n=26 — QFT's far SWAPs made it the
# single largest e2e cost.  Here the state is viewed as
# (A, 2, B, 128): the high bit is a leading plane axis, and the lane
# bit is handled by 128x128 constant lane operators on the MXU —
# out[ho] = sum_h x[h] @ L[ho,h]^T — fused over both planes in ONE
# HBM pass.  Requires hi >= 10 so the sublane dim B >= 8.


def mixed_pair_supported(qa: int, qb: int, lane: int = 7) -> bool:
    hi, lo = max(qa, qb), min(qa, qb)
    return lo < lane and hi >= 10


def _mixed_lane_ops(U, qa: int, qb: int) -> np.ndarray:
    """L[ho, h] = 128x128 lane operator for high-plane pair (ho, h)."""
    from .dense import expand_to_low_block

    hi, lo = max(qa, qb), min(qa, qb)

    def sub(h: int, l: int) -> int:
        return (h << 1) | l if qa == hi else (l << 1) | h

    u = np.asarray(U, dtype=np.complex128)
    L = np.zeros((2, 2, 128, 128), dtype=np.complex128)
    for ho in (0, 1):
        for h in (0, 1):
            blk = np.array(
                [[u[sub(ho, a), sub(h, b)] for b in (0, 1)] for a in (0, 1)])
            L[ho, h] = expand_to_low_block((lo,), blk, 7)
    return L


def _mixed_kernel(re_ref, im_ref, lr_ref, li_ref, ore_ref, oim_ref, *,
                  use_r, use_i):
    _DN2 = (((2,), (1,)), ((), ()))

    def mm(x, m):
        return jax.lax.dot_general(x, m, _DN2, precision=HI)

    xs = {h: (re_ref[:, h, :, :], im_ref[:, h, :, :]) for h in (0, 1)}

    def add(a, t):
        return t if a is None else a + t

    for ho in (0, 1):
        ar = ai = None
        for h in (0, 1):
            xr, xi = xs[h]
            if use_r[ho][h]:
                mr = lr_ref[ho, h, :, :]
                ar = add(ar, mm(xr, mr))
                ai = add(ai, mm(xi, mr))
            if use_i[ho][h]:
                mi = li_ref[ho, h, :, :]
                ar = add(ar, -mm(xi, mi))
                ai = add(ai, mm(xr, mi))
        if ar is None:
            ar = jnp.zeros_like(xs[0][0])
            ai = jnp.zeros_like(xs[0][1])
        ore_ref[:, ho, :, :] = ar
        oim_ref[:, ho, :, :] = ai


def mixed_pair_planar(
    re: jnp.ndarray,
    im: jnp.ndarray,
    qa: int,
    qb: int,
    U: np.ndarray,
    *,
    interpret: bool = False,
    inplace: bool = False,
):
    """Apply a 4x4 unitary to (high, lane) qubit pair on f32 planes."""
    hi = max(qa, qb)
    assert mixed_pair_supported(qa, qb), (qa, qb)
    L = _mixed_lane_ops(U, qa, qb)
    N = re.size
    fdtype = re.dtype
    A = N >> (hi + 1)
    B = 1 << (hi - 7)

    Lr = np.ascontiguousarray(L.real, dtype=fdtype)
    Li = np.ascontiguousarray(L.imag, dtype=fdtype)
    use_r = [[bool(Lr[ho, h].any()) for h in (0, 1)] for ho in (0, 1)]
    use_i = [[bool(Li[ho, h].any()) for h in (0, 1)] for ho in (0, 1)]

    BB = min(B, 256)
    BA = min(A, max(1, (1 << 16) // (2 * BB * 128)))
    spec = pl.BlockSpec((BA, 2, BB, 128), lambda a, b: (a, 0, b, 0),
                        memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((2, 2, 128, 128), lambda a, b: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    kern = functools.partial(_mixed_kernel, use_r=use_r, use_i=use_i)
    ore, oim = pl.pallas_call(
        kern,
        grid=(A // BA, B // BB),
        in_specs=[spec, spec, lspec, lspec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((A, 2, B, 128), fdtype)] * 2,
        input_output_aliases={0: 0, 1: 1} if inplace else {},
        interpret=interpret,
    )(re.reshape(A, 2, B, 128), im.reshape(A, 2, B, 128),
      jnp.asarray(Lr), jnp.asarray(Li))
    return ore.reshape(N), oim.reshape(N)


def midpair_supported(qa: int, qb: int) -> bool:
    hi, lo = max(qa, qb), min(qa, qb)
    return 7 <= lo <= 9 and hi >= 10


def _midpair_kernel(re_ref, im_ref, ore_ref, oim_ref, *, t, C):
    # Block (BA, 2, BB, 8, 128): hi bit on axis 1, the lo bit at
    # position t inside the 8-axis (row bits [0,3)); value reshape
    # exposes it.  All four output planes are written in one step, so
    # in/out aliasing is hazard-free.
    def planes(ref):
        v = ref[:]
        s = v.shape
        return v.reshape(s[0], 2, s[2], 8 >> (t + 1), 2, 1 << t, 128)

    vre = planes(re_ref)
    vim = planes(im_ref)
    keys = [(0, 0), (0, 1), (1, 0), (1, 1)]
    xs = [(vre[:, h, :, :, l, :, :], vim[:, h, :, :, l, :, :])
          for h, l in keys]
    shape = xs[0][0].shape
    outs = {}
    for ho, lo_ in keys:
        outs[(ho, lo_)] = _plane_lincomb(
            [C[ho, lo_, h, l] for h, l in keys], xs, shape, re_ref.dtype)

    def assemble(part):
        # stack back to (BA, 2, BB, 8>>t+1, 2, 2^t, 128) -> block shape
        hs = []
        for ho in (0, 1):
            ls = jnp.stack([outs[(ho, 0)][part], outs[(ho, 1)][part]],
                           axis=3)
            hs.append(ls)
        return jnp.stack(hs, axis=1).reshape(re_ref.shape)

    ore_ref[:] = assemble(0)
    oim_ref[:] = assemble(1)


def midpair_planar(
    re: jnp.ndarray,
    im: jnp.ndarray,
    qa: int,
    qb: int,
    U: np.ndarray,
    *,
    interpret: bool = False,
    inplace: bool = False,
):
    """Generic 2q gate on (7..9, >=10) qubit pairs — layout-free.

    The planar XLA lincomb handles these but allocates out-of-place
    (and the SWAP transpose's (...,2,2^lo) views force padded layouts
    that OOM at n=30); this kernel views the state as
    (A, 2, B, 8, 128) — always a bitcast — with scalar plane
    coefficients from the 4x4 U (structural zeros elided at trace
    time, so CNOT/SWAP cost no multiplies).
    """
    hi, lo = max(qa, qb), min(qa, qb)
    assert midpair_supported(qa, qb), (qa, qb)
    t = lo - 7
    C = _pair_coeffs(U, qa, qb)
    N = re.size
    fdtype = re.dtype
    A = N >> (hi + 1)
    B = 1 << (hi - 10)
    BB = min(B, 32)
    while B % BB:
        BB //= 2
    BA = min(A, max(1, 64 // (2 * BB)))
    while A % BA:
        BA //= 2
    spec = pl.BlockSpec((BA, 2, BB, 8, 128), lambda a, b: (a, 0, b, 0, 0),
                        memory_space=pltpu.VMEM)
    kern = functools.partial(_midpair_kernel, t=t, C=C)
    ore, oim = pl.pallas_call(
        kern,
        grid=(A // BA, B // BB),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((A, 2, B, 8, 128), fdtype)] * 2,
        input_output_aliases={0: 0, 1: 1} if inplace else {},
        interpret=interpret,
    )(re.reshape(A, 2, B, 8, 128), im.reshape(A, 2, B, 8, 128))
    return ore.reshape(N), oim.reshape(N)


def _theta_matmul(a_ref, m_ref, s_spec, fdtype):
    """theta block from the matmul-form diag plan (ops/diag_plan.py).

    A (rows, C) operand scaled by the per-grid-step S vector, then one
    MXU matmul against the (C, 128) lane-factor operand: the whole
    merged-run angle field for this block in ~C/128 of a panel
    matmul's flops.  Returns (rows, 128); caller reshapes to the block.
    """
    A = a_ref[:]
    if any(sp is not None for sp in s_spec):
        scal = []
        for spec in s_spec:
            if spec is None:
                scal.append(jnp.full((), 1.0, fdtype))
                continue
            s = jnp.zeros((), fdtype)
            for coeff, pbits in spec:
                t = jnp.full((), coeff, fdtype)
                for axis, shift in pbits:
                    t = t * ((pl.program_id(axis) >> shift) & 1).astype(
                        fdtype)
                s = s + t
            scal.append(s)
        A = A * jnp.stack(scal).reshape(1, len(s_spec))
    return jax.lax.dot_general(
        A, m_ref[:], (((1,), (0,)), ((), ())), precision=HI)


def _fused_diag_matmul_kernel(re_ref, im_ref, a_ref, m_ref, ore_ref,
                              oim_ref, *, s_spec):
    th = _theta_matmul(a_ref, m_ref, s_spec, re_ref.dtype).reshape(
        re_ref.shape)
    c = jnp.cos(th)
    s = jnp.sin(th)
    r = re_ref[:]
    i = im_ref[:]
    ore_ref[:] = r * c - i * s
    oim_ref[:] = r * s + i * c


def _fused_diag_kernel(re_ref, im_ref, ore_ref, oim_ref, *,
                       row_terms, lane_terms, cross_terms, group_terms, ba):
    # theta(idx) = sum coeff * prod(bits): row terms (all qubits >= 7)
    # produce angles on (BA, 8, 1) — cos/sin amortized over the 128
    # lanes; lane terms (< 7) on (1, 1, 128); cross terms compose as
    # exact {0, gamma} rotations with ALGEBRAIC cos/sin (the bit
    # product is 0/1), so no per-element transcendentals anywhere.
    f = re_ref.dtype
    ia = jax.lax.broadcasted_iota(jnp.int32, (ba, 8, 1), 0) \
        + pl.program_id(0) * ba
    ip = jax.lax.broadcasted_iota(jnp.int32, (ba, 8, 1), 1)
    il = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)

    def bit(q):
        if q < 7:
            return ((il >> q) & 1).astype(f)
        if q < 10:
            return ((ip >> (q - 7)) & 1).astype(f)
        return ((ia >> (q - 10)) & 1).astype(f)

    def angle(terms, shape):
        th = jnp.zeros(shape, f)
        for qs, coeff in terms:
            t = jnp.full(shape, coeff, f)
            for q in qs:
                t = t * bit(q)
            th = th + t
        return th

    tr = angle(row_terms, (ba, 8, 1))
    tl = angle(lane_terms, (1, 1, 128))
    cr, sr = jnp.cos(tr), jnp.sin(tr)
    cl, sl = jnp.cos(tl), jnp.sin(tl)
    c = cr * cl - sr * sl
    s = sr * cl + cr * sl
    for qs, coeff in cross_terms:
        m = jnp.ones((1, 1, 1), f)
        for q in qs:
            m = m * bit(q)
        ck = 1.0 + (float(np.cos(coeff)) - 1.0) * m
        sk = float(np.sin(coeff)) * m
        c, s = c * ck - s * sk, s * ck + c * sk

    # Factored cross groups (wide merged runs): all terms sharing one
    # lane-bit subset compose into a SINGLE rotation whose angle is a
    # row quantity — cos/sin amortize over the 128 lanes and the
    # per-element cost is one masked rotation per GROUP, not per term.
    for low_qs, rterms in group_terms:
        ag = angle(rterms, (ba, 8, 1))
        cg, sg = jnp.cos(ag), jnp.sin(ag)
        m = jnp.ones((1, 1, 128), f)
        for q in low_qs:
            m = m * bit(q)
        ck = 1.0 + (cg - 1.0) * m
        sk = sg * m
        c, s = c * ck - s * sk, s * ck + c * sk

    r = re_ref[:]
    i = im_ref[:]
    ore_ref[:] = r * c - i * s
    oim_ref[:] = r * s + i * c


def _fused_diag_small_kernel(re_ref, im_ref, *rest, lane_terms,
                             cross_terms, sources, ba):
    # Every row-side angle decomposes by the block structure of the
    # (A, 8, 128) plane view: state bits [7, SPLIT) vary INSIDE a
    # block (sublane + local block-row) and bits >= SPLIT are fixed
    # per grid step.  So each angle source (the pure-row angle, and
    # one per lane-subset cross group) splits into
    #   - an in-block part: a (BA, 8) cos/sin CONSTANT table (512
    #     numpy literals, constant index map -> one DMA per pass),
    #   - a per-block part: a SCALAR angle from program_id bits
    #     (cos/sin of a scalar is one vreg of work),
    #   - straddle terms (bits on both sides): a skinny masked
    #     rotation whose angle is again a program_id scalar,
    # composed on (BA, 8, 1) values.  No 16x-padded (A, 8) operands
    # (they OOMed n=30 and paid 16x read traffic), no per-pass XLA
    # table generation (a full-size table costs more to generate than
    # the plane sweep it serves), no lane-offset slicing or in-kernel
    # relayouts (measured 9-27 GB/s — Mosaic lowers them to scalar
    # shuffles).
    ore_ref, oim_ref = rest[-2:]
    tab_refs = rest[:-2]
    f = re_ref.dtype
    a = pl.program_id(0)
    ia = jax.lax.broadcasted_iota(jnp.int32, (ba, 8, 1), 0) + a * ba
    ilj = jax.lax.broadcasted_iota(jnp.int32, (ba, 8, 1), 0)
    ip = jax.lax.broadcasted_iota(jnp.int32, (ba, 8, 1), 1)
    il = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)

    def bit(q):  # global index bit (leftover cross terms)
        if q < 7:
            return ((il >> q) & 1).astype(f)
        if q < 10:
            return ((ip >> (q - 7)) & 1).astype(f)
        return ((ia >> (q - 10)) & 1).astype(f)

    def bit_in(q):  # in-block row bit, 7 <= q < SPLIT
        if q < 10:
            return ((ip >> (q - 7)) & 1).astype(f)
        return ((ilj >> (q - 10)) & 1).astype(f)

    def blk_angle(shift_terms):  # scalar angle from program_id bits
        th = jnp.zeros((), f)
        for shifts, coeff in shift_terms:
            t = jnp.full((), coeff, f)
            for k in shifts:
                t = t * ((a >> k) & 1).astype(f)
            th = th + t
        return th

    ti = 0
    skinny = []
    for low_qs, has_in, blk_terms, straddles in sources:
        if has_in:
            c = tab_refs[ti][:][:, :, None]
            s = tab_refs[ti + 1][:][:, :, None]
            ti += 2
        else:
            c = jnp.ones((1, 1, 1), f)
            s = jnp.zeros((1, 1, 1), f)
        if blk_terms:
            th = blk_angle(blk_terms)
            cb, sb = jnp.cos(th), jnp.sin(th)
            c, s = c * cb - s * sb, s * cb + c * sb
        for inkey, dterms in straddles:
            d = blk_angle(dterms)
            cd, sd = jnp.cos(d), jnp.sin(d)
            m = jnp.ones((1, 1, 1), f)
            for q in inkey:
                m = m * bit_in(q)
            ck = 1.0 + (cd - 1.0) * m
            sk = sd * m
            c, s = c * ck - s * sk, s * ck + c * sk
        skinny.append((low_qs, c, s))

    tl = jnp.zeros((1, 1, 128), f)
    for qs, coeff in lane_terms:
        t = jnp.full((1, 1, 128), coeff, f)
        for q in qs:
            t = t * bit(q)
        tl = tl + t
    cl, sl = jnp.cos(tl), jnp.sin(tl)
    _, cr, sr = skinny[0]  # base source (low_qs is None)
    c = cr * cl - sr * sl
    s = sr * cl + cr * sl
    for low_qs, cg, sg in skinny[1:]:
        m = jnp.ones((1, 1, 128), f)
        for q in low_qs:
            m = m * bit(q)
        ck = 1.0 + (cg - 1.0) * m
        sk = sg * m
        c, s = c * ck - s * sk, s * ck + c * sk
    for qs, coeff in cross_terms:  # ungrouped leftovers (rare)
        m = jnp.ones((1, 1, 1), f)
        for q in qs:
            m = m * bit(q)
        ck = 1.0 + (float(np.cos(coeff)) - 1.0) * m
        sk = float(np.sin(coeff)) * m
        c, s = c * ck - s * sk, s * ck + c * sk

    r = re_ref[:]
    i = im_ref[:]
    ore_ref[:] = r * c - i * s
    oim_ref[:] = r * s + i * c


# Above this many row-side terms the row-table path pays for itself
# (below it, the in-kernel iota math avoids the extra table operands).
_DIAG_TABLE_MIN_TERMS = 4
# Table pairs are one HBM operand each (N/128 f32); cap how many ride
# one pass so table traffic stays a small fraction of the plane sweep.
_DIAG_MAX_GROUPS = 16
def fused_diag_planar(
    re: jnp.ndarray,
    im: jnp.ndarray,
    terms,
    *,
    interpret: bool = False,
    inplace: bool = False,
    group_min: int = 1,
):
    """Merged diagonal run in ONE aliased pass — any qubit mix.

    ``terms`` is the Möbius phase decomposition
    (``circuit/panelize.diag_phase_terms``): theta(idx) = sum of
    coeff * prod(index bits).  Row-heavy runs precompute per-row
    cos/sin tables in XLA (shape (N/1024, 8), one table pair for the
    pure-row angle and one per lane-subset cross group) and the kernel
    applies them as broadcast rotations; light runs compute everything
    from iota bit arithmetic in-kernel.  Either way: no 2^m table, no
    gather, no layout-unsafe broadcast — the capacity tier applies a
    whole diagonal run at elementwise speed where the XLA shear path
    needed 3-4 full HBM passes.  TPU analogue of the reference's fused
    diagonal entry tables (``v3 parallel_gate_applicator.py:128-232``).
    """
    N = re.size
    fdtype = re.dtype
    A = N // (8 * 128)
    if A == 0:
        # Tiny states (n < 10, tests / fallback callers): the phase
        # vector is a static constant — no kernel needed.
        idx = np.arange(N)
        th = np.zeros(N)
        for qs, coeff in terms:
            t = np.full(N, float(coeff))
            for q in qs:
                t = t * ((idx >> q) & 1)
            th += t
        c = jnp.asarray(np.cos(th), fdtype)
        s = jnp.asarray(np.sin(th), fdtype)
        return re * c - im * s, re * s + im * c
    row_terms, lane_terms, cross_all = [], [], []
    for qs, coeff in terms:
        qs = tuple(qs)
        if all(q >= 7 for q in qs) and qs:
            row_terms.append((qs, float(coeff)))
        elif all(q < 7 for q in qs):
            lane_terms.append((qs, float(coeff)))  # incl. () global
        else:
            cross_all.append((qs, float(coeff)))

    # Group cross terms by lane-bit subset: a group composes into one
    # masked rotation with a row-side angle (one vector cos/sin pair
    # per group).  Worth it from 3 terms (below that the trace-time
    # scalar algebraic form stays cheaper — the round-1 measurement
    # that reverted whole-kernel vector cos/sin).
    by_low: dict = {}
    for qs, coeff in cross_all:
        low = tuple(q for q in qs if q < 7)
        row = tuple(q for q in qs if q >= 7)
        by_low.setdefault(low, []).append((row, coeff))
    use_tables = (len(row_terms) + len(cross_all)
                  >= _DIAG_TABLE_MIN_TERMS)
    threshold = group_min if use_tables else max(group_min, 3)
    cross_terms, group_terms = [], []
    for low, rterms in by_low.items():
        if len(rterms) >= threshold:
            group_terms.append((low, tuple(rterms)))
        else:
            cross_terms.extend(
                (tuple(sorted(low + row)), c) for row, c in rterms)

    # 64-row blocks (256 KB per plane buffer).  Measured 415-460 GB/s
    # on v5e at BA 16 and 64 (within run-to-run noise).
    BA = min(A, 64)
    while A % BA:
        BA //= 2
    spec = pl.BlockSpec((BA, 8, 128), lambda a: (a, 0, 0),
                        memory_space=pltpu.VMEM)

    if os.environ.get("QST_DIAG_MATMUL", "1") != "0":
        # Matmul-form kernel: the whole angle field of the block is
        # ONE (rows, C) x (C, 128) MXU matmul + one cos/sin per
        # element, flop count independent of the term count (the
        # composition form below pays ~6 VPU flops per element per
        # lane-subset group — measured 317-345 GB/s on qft26's merged
        # runs).  Falls through when the run needs > MAX_COLS columns.
        from .diag_plan import plan_diag_matmul

        split = 10 + (BA.bit_length() - 1)
        plan = plan_diag_matmul(
            terms,
            row_bit_of={q: q - 7 for q in range(7, split)},
            grid_bit_of={q: (0, q - split) for q in range(split, 64)},
            n_rows=BA * 8,
        )
        if plan is not None:
            Amat, Mmat, s_spec = plan
            aspec = pl.BlockSpec((BA * 8, Amat.shape[1]),
                                 lambda a: (0, 0),
                                 memory_space=pltpu.VMEM)
            mspec = pl.BlockSpec(Mmat.shape, lambda a: (0, 0),
                                 memory_space=pltpu.VMEM)
            kern = functools.partial(
                _fused_diag_matmul_kernel, s_spec=s_spec)
            ore, oim = pl.pallas_call(
                kern,
                grid=(A // BA,),
                in_specs=[spec, spec, aspec, mspec],
                out_specs=[spec, spec],
                out_shape=[jax.ShapeDtypeStruct((A, 8, 128), fdtype)] * 2,
                input_output_aliases={0: 0, 1: 1} if inplace else {},
                interpret=interpret,
            )(re.reshape(A, 8, 128), im.reshape(A, 8, 128),
              jnp.asarray(Amat, fdtype), jnp.asarray(Mmat, fdtype))
            return ore.reshape(N), oim.reshape(N)

    if use_tables:
        # Small-table path: each angle source (pure-row angle + one
        # per lane-subset cross group) splits at SPLIT = the first
        # state bit that is fixed within a kernel block.  In-block
        # parts become (BA, 8) numpy CONSTANT cos/sin tables (512
        # literals, one DMA per pass); per-block parts become scalar
        # program_id-bit angles in-kernel; straddling terms become
        # skinny masked rotations keyed by their in-block bit subset.
        # See _fused_diag_small_kernel for the raced alternatives this
        # replaced.
        group_terms.sort(key=lambda g: len(g[1]), reverse=True)
        tabled = group_terms[:_DIAG_MAX_GROUPS]
        for low, rterms in group_terms[_DIAG_MAX_GROUPS:]:
            cross_terms.extend(
                (tuple(sorted(low + rw)), c) for rw, c in rterms)

        split = 10 + (BA.bit_length() - 1)
        jj = np.arange(BA)[:, None]
        pp = np.arange(8)[None, :]

        def build_source(low_qs, rterms):
            in_t, blk_t, strads = [], [], {}
            for qs, coeff in rterms:
                inb = tuple(q for q in qs if q < split)
                blk = tuple(q - split for q in qs if q >= split)
                if not blk:
                    in_t.append((qs, coeff))
                elif not inb:
                    blk_t.append((blk, float(coeff)))
                else:
                    strads.setdefault(inb, []).append(
                        (blk, float(coeff)))
            tables = ()
            if in_t:
                th = np.zeros((BA, 8))
                for qs, coeff in in_t:
                    t = np.full((BA, 8), float(coeff))
                    for q in qs:
                        t = t * ((pp >> (q - 7)) & 1 if q < 10
                                 else (jj >> (q - 10)) & 1)
                    th = th + t
                tables = (jnp.asarray(np.cos(th), fdtype),
                          jnp.asarray(np.sin(th), fdtype))
            meta = (low_qs, bool(in_t), tuple(blk_t),
                    tuple((k, tuple(v)) for k, v in strads.items()))
            return meta, tables

        sources, tabs = [], []
        meta, t = build_source(None, row_terms)
        sources.append(meta)
        tabs.extend(t)
        for low, rterms in tabled:
            meta, t = build_source(tuple(low), tuple(rterms))
            sources.append(meta)
            tabs.extend(t)

        tspec = pl.BlockSpec((BA, 8), lambda a: (0, 0),
                             memory_space=pltpu.VMEM)
        kern = functools.partial(
            _fused_diag_small_kernel, lane_terms=tuple(lane_terms),
            cross_terms=tuple(cross_terms), sources=tuple(sources),
            ba=BA)
        ore, oim = pl.pallas_call(
            kern,
            grid=(A // BA,),
            in_specs=[spec, spec] + [tspec] * len(tabs),
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((A, 8, 128), fdtype)] * 2,
            input_output_aliases={0: 0, 1: 1} if inplace else {},
            interpret=interpret,
        )(re.reshape(A, 8, 128), im.reshape(A, 8, 128), *tabs)
        return ore.reshape(N), oim.reshape(N)

    kern = functools.partial(
        _fused_diag_kernel, row_terms=tuple(row_terms),
        lane_terms=tuple(lane_terms), cross_terms=tuple(cross_terms),
        group_terms=tuple(group_terms), ba=BA)
    ore, oim = pl.pallas_call(
        kern,
        grid=(A // BA,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((A, 8, 128), fdtype)] * 2,
        input_output_aliases={0: 0, 1: 1} if inplace else {},
        interpret=interpret,
    )(re.reshape(A, 8, 128), im.reshape(A, 8, 128))
    return ore.reshape(N), oim.reshape(N)


def mixed_low_pair_supported(qa: int, qb: int, lane: int = 7) -> bool:
    hi, lo = max(qa, qb), min(qa, qb)
    return lo < lane and lane <= hi <= 9


def _mixed_low_kernel(re_ref, im_ref, lr_ref, li_ref, ore_ref, oim_ref, *,
                      t, use_r, use_i):
    # Block (BA, 8, 128): row-bits [0,3) in the middle axis, the hi bit
    # at position t; the lane bit rides the 128x128 L operators.  The
    # value reshape splits the middle axis so the hi bit is indexable —
    # all above the minor-two dims, so it is layout-free in VREGs.
    _DN2 = (((3,), (1,)), ((), ()))

    def mm(x, m):
        return jax.lax.dot_general(x, m, _DN2, precision=HI)

    def planes(ref):
        v = ref[:]
        ba = v.shape[0]
        return v.reshape(ba, 8 >> (t + 1), 2, 1 << t, 128)

    vre = planes(re_ref)
    vim = planes(im_ref)
    xs = {h: (vre[:, :, h, :, :], vim[:, :, h, :, :]) for h in (0, 1)}

    def add(a, v):
        return v if a is None else a + v

    out_r = []
    out_i = []
    for ho in (0, 1):
        ar = ai = None
        for h in (0, 1):
            xr, xi = xs[h]
            if use_r[ho][h]:
                m = lr_ref[ho, h, :, :]
                ar = add(ar, mm(xr, m))
                ai = add(ai, mm(xi, m))
            if use_i[ho][h]:
                m = li_ref[ho, h, :, :]
                ar = add(ar, -mm(xi, m))
                ai = add(ai, mm(xr, m))
        if ar is None:
            ar = jnp.zeros_like(xs[0][0])
            ai = jnp.zeros_like(xs[0][1])
        out_r.append(ar)
        out_i.append(ai)

    shape = re_ref.shape
    ore_ref[:] = jnp.stack(out_r, axis=2).reshape(shape)
    oim_ref[:] = jnp.stack(out_i, axis=2).reshape(shape)


def _mixed_low_vec_kernel(re_ref, im_ref, vr_ref, vi_ref, ore_ref, oim_ref,
                          *, t, use_r, use_i):
    # Lane-diagonal fast path: every 128x128 lane operator is diagonal
    # (the gate never moves the lane qubit — e.g. CNOT/CU/CY with the
    # control in the lane), so the update is a per-lane VECTOR multiply
    # on the VPU instead of four MXU matmuls: bandwidth-bound, not
    # compute-bound (CNOT(6,7) measured 20 ms matmul vs ~7 ms here at
    # n=28).
    def planes(ref):
        v = ref[:]
        ba = v.shape[0]
        return v.reshape(ba, 8 >> (t + 1), 2, 1 << t, 128)

    vre = planes(re_ref)
    vim = planes(im_ref)
    xs = {h: (vre[:, :, h, :, :], vim[:, :, h, :, :]) for h in (0, 1)}

    def add(a, v):
        return v if a is None else a + v

    out_r = []
    out_i = []
    for ho in (0, 1):
        ar = ai = None
        for h in (0, 1):
            xr, xi = xs[h]
            if use_r[ho][h]:
                v = vr_ref[ho, h, :]
                ar = add(ar, xr * v)
                ai = add(ai, xi * v)
            if use_i[ho][h]:
                v = vi_ref[ho, h, :]
                ar = add(ar, -(xi * v))
                ai = add(ai, xr * v)
        if ar is None:
            ar = jnp.zeros_like(xs[0][0])
            ai = jnp.zeros_like(xs[0][1])
        out_r.append(ar)
        out_i.append(ai)

    shape = re_ref.shape
    ore_ref[:] = jnp.stack(out_r, axis=2).reshape(shape)
    oim_ref[:] = jnp.stack(out_i, axis=2).reshape(shape)


def mixed_low_pair_planar(
    re: jnp.ndarray,
    im: jnp.ndarray,
    qa: int,
    qb: int,
    U: np.ndarray,
    *,
    interpret: bool = False,
    inplace: bool = False,
):
    """2q gate on (lane, 7..9) pairs — the straddler hole, layout-free.

    The wide pos-0 panel formulation viewed the state as (R, 2^(hi+1))
    whose 256..1024-wide rows don't linearise against the flat tiling,
    so XLA inserted 4 GiB retiling copies (fatal at n=30).  Here the
    view is (A, 8, 128) — always linear-safe — with the hi bit indexed
    inside the 8-axis and the lane bit folded into 128x128 MXU lane
    operators (same scheme as :func:`mixed_pair_planar`).
    """
    hi = max(qa, qb)
    assert mixed_low_pair_supported(qa, qb), (qa, qb)
    t = hi - 7
    L = _mixed_lane_ops(U, qa, qb)
    N = re.size
    fdtype = re.dtype

    A = N // (8 * 128)
    BA = min(A, 64)
    while A % BA:
        BA //= 2
    spec = pl.BlockSpec((BA, 8, 128), lambda a: (a, 0, 0),
                        memory_space=pltpu.VMEM)

    lane_diag = all(
        not np.any(L[ho, h] - np.diag(np.diag(L[ho, h])))
        for ho in (0, 1) for h in (0, 1)
    )
    if lane_diag:
        # V[ho, h] = diag(L[ho, h]): the gate is diagonal over lane
        # positions, so each output plane is a vector lin-comb.
        V = np.stack([[np.diag(L[ho, h]) for h in (0, 1)] for ho in (0, 1)])
        Vr = np.ascontiguousarray(V.real, dtype=fdtype)
        Vi = np.ascontiguousarray(V.imag, dtype=fdtype)
        use_r = [[bool(Vr[ho, h].any()) for h in (0, 1)] for ho in (0, 1)]
        use_i = [[bool(Vi[ho, h].any()) for h in (0, 1)] for ho in (0, 1)]
        vspec = pl.BlockSpec((2, 2, 128), lambda a: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        kern = functools.partial(_mixed_low_vec_kernel, t=t,
                                 use_r=use_r, use_i=use_i)
        ore, oim = pl.pallas_call(
            kern,
            grid=(A // BA,),
            in_specs=[spec, spec, vspec, vspec],
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((A, 8, 128), fdtype)] * 2,
            input_output_aliases={0: 0, 1: 1} if inplace else {},
            interpret=interpret,
        )(re.reshape(A, 8, 128), im.reshape(A, 8, 128),
          jnp.asarray(Vr), jnp.asarray(Vi))
        return ore.reshape(N), oim.reshape(N)

    Lr = np.ascontiguousarray(L.real, dtype=fdtype)
    Li = np.ascontiguousarray(L.imag, dtype=fdtype)
    use_r = [[bool(Lr[ho, h].any()) for h in (0, 1)] for ho in (0, 1)]
    use_i = [[bool(Li[ho, h].any()) for h in (0, 1)] for ho in (0, 1)]

    lspec = pl.BlockSpec((2, 2, 128, 128), lambda a: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    kern = functools.partial(_mixed_low_kernel, t=t, use_r=use_r, use_i=use_i)
    ore, oim = pl.pallas_call(
        kern,
        grid=(A // BA,),
        in_specs=[spec, spec, lspec, lspec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((A, 8, 128), fdtype)] * 2,
        input_output_aliases={0: 0, 1: 1} if inplace else {},
        interpret=interpret,
    )(re.reshape(A, 8, 128), im.reshape(A, 8, 128),
      jnp.asarray(Lr), jnp.asarray(Li))
    return ore.reshape(N), oim.reshape(N)


# ---------------------------------------------------------------------------
# Lane<->top crossing kernel: 7 wide SWAPs in ONE aliased pass
# ---------------------------------------------------------------------------
#
# QFT's terminal bit reversal contains 7 lane<->top SWAP pairs (q,
# n-1-q) for q < 7 that never fit a panel window; run individually
# through the mixed-pair kernels they cost 7 full HBM sweeps.  As a
# set they are one in-tile transform of the (128, M, 128) view (lanes
# = bits [0,7), top = bits [n-7, n)): the middle index is untouched,
# so blocks are (128, 8, 128) with IDENTITY index maps — which also
# makes input_output_aliases safe (each grid step writes exactly the
# slots it read), i.e. ZERO extra HBM at capacity.
#
# The 128x128 tile transform out[x, y] = X[f(y), g(x)] runs as two
# permutation-matrix matmuls on the MXU (exact: 0/1 operands select
# single f32 entries even through the bf16 passes).  TPU analogue of
# the reference's bit-permutation redistribution
# (``hisvsim_repo/mpi_redistributer.hpp:20-33`` — there across MPI
# ranks, here across the index bits of one chip's HBM).  The middle
# pairs of a SWAP network go through the multiswap / pair-kernel
# paths; see ``runtime/simulator.apply_window_op``.


def _bitperm_cross_kernel(re_ref, im_ref, pf_ref, pg_ref,
                          ore_ref, oim_ref, *, bm):
    pf = pf_ref[:]
    pg = pg_ref[:]
    for ref, oref in ((re_ref, ore_ref), (im_ref, oim_ref)):
        for j in range(bm):
            x = ref[:, j, :]
            # C[y, j] = X[f(y), j]; out[x, y] = C[y, g(x)] via a
            # dim1-dim1 contraction — no explicit transpose needed.
            c = jax.lax.dot_general(pf, x, (((1,), (0,)), ((), ())),
                                    precision=HI)
            oref[:, j, :] = jax.lax.dot_general(
                pg, c, (((1,), (1,)), ((), ())), precision=HI)


def bitperm_cross_planar(
    re: jnp.ndarray,
    im: jnp.ndarray,
    cross: tuple,
    *,
    interpret: bool = False,
    inplace: bool = False,
):
    """out[i] = in[sigma(i)], sigma = the 7 transpositions lane l <->
    top bit cross[l] (a complete bijection onto [n-7, n))."""
    n = int(np.log2(re.size))
    assert n >= 14, "crossing kernel needs the (128, M, 128) view"
    assert sorted(cross) == list(range(n - 7, n)), "incomplete cross"
    M = 1 << (n - 14)
    BM = 8 if M >= 8 else M
    # f: in top field value from out lane value; g: in lane field
    # value from out top value.  bit pi(l) of f(b) = bit l of b.
    pi = [cross[el] - (n - 7) for el in range(7)]
    f = [0] * 128
    g = [0] * 128
    for v in range(128):
        fv = 0
        gv = 0
        for el in range(7):
            fv |= ((v >> el) & 1) << pi[el]
            gv |= ((v >> pi[el]) & 1) << el
        f[v] = fv
        g[v] = gv
    fdtype = re.dtype
    pf = np.zeros((128, 128), dtype=fdtype)
    pg = np.zeros((128, 128), dtype=fdtype)
    pf[np.arange(128), f] = 1.0  # PF[y, i] = [i == f(y)]
    pg[np.arange(128), g] = 1.0  # PG[x, j] = [j == g(x)]

    spec = pl.BlockSpec((128, BM, 128), lambda m: (0, m, 0),
                        memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((128, 128), lambda m: (0, 0),
                         memory_space=pltpu.VMEM)
    ore, oim = pl.pallas_call(
        functools.partial(_bitperm_cross_kernel, bm=BM),
        grid=(M // BM,),
        in_specs=[spec, spec, wspec, wspec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((128, M, 128), fdtype)] * 2,
        input_output_aliases={0: 0, 1: 1} if inplace else {},
        interpret=interpret,
    )(re.reshape(128, M, 128), im.reshape(128, M, 128),
      jnp.asarray(pf), jnp.asarray(pg))
    return ore.reshape(re.size), oim.reshape(im.size)


def _axis_exchange(v, shape, kshape, ax_pairs):
    # kshape: the block value shape with the sublane 8-axis split into
    # (2, 2, 2) (bits 9, 8, 7 MSB-first); ax_pairs: axis-index pairs of
    # kshape to coordinate-exchange (each pair one unrolled 2x2
    # stack — a pure in-VMEM shuffle, no arithmetic).
    v = v.reshape(kshape)
    for a1, a2 in ax_pairs:
        lo, hi = (a1, a2) if a1 < a2 else (a2, a1)
        rows = []
        for x in (0, 1):
            cols = []
            for y in (0, 1):
                sl = [slice(None)] * len(kshape)
                sl[lo] = y
                sl[hi] = x
                cols.append(v[tuple(sl)])
            rows.append(jnp.stack(cols, axis=hi - 1))
        v = jnp.stack(rows, axis=lo)
    return v.reshape(shape)


def _bitperm_swap_kernel(re_ref, im_ref, ore_ref, oim_ref, *,
                         kshape, ax_pairs):
    if ax_pairs:
        ore_ref[:] = _axis_exchange(re_ref[:], re_ref.shape, kshape,
                                    ax_pairs)
        oim_ref[:] = _axis_exchange(im_ref[:], im_ref.shape, kshape,
                                    ax_pairs)
    else:
        ore_ref[:] = re_ref[:]
        oim_ref[:] = im_ref[:]


def bitperm_swap_planar(
    re: jnp.ndarray,
    im: jnp.ndarray,
    pairs,
    *,
    grid_map=None,
    split_planes: bool = False,
    interpret: bool = False,
    block_elems: int = 1 << 18,
):
    """Bit permutation among bits >= 7 in ONE out-of-place pass.

    ``pairs``: disjoint transpositions; those with both bits >= 10
    ride the INPUT BLOCK INDEX MAP — a pure re-addressing of which HBM
    block each grid step reads, zero in-kernel work (the
    TPU-single-chip analogue of the reference's MPI subarray-datatype
    redistribution, ``hisvsim_repo/mpi_redistributer.hpp:20-33``);
    pairs touching the sublane bits [7, 10) exchange in-VMEM via
    unrolled 2x2 axis stacks.  ``grid_map``: an additional ARBITRARY
    bijection on bits >= 10 given as {out_bit: in_bit} — also free via
    the index maps (the terminal-bitperm residual top permutation).
    Out-of-place only: a grid step writes slots it did not read, so
    ``input_output_aliases`` would race.  ``split_planes`` processes
    re and im in two barriered passes so peak liveness stays at 3
    planes (the capacity-tier requirement).
    """
    n = int(np.log2(re.size))
    assert n >= 10, "bitperm swap needs the (.., 8, 128) view"
    pairs = tuple(tuple(sorted(p)) for p in pairs)
    grid_map = dict(grid_map or {})
    flat = [b for p in pairs for b in p]
    assert len(set(flat)) == len(flat), "pairs must be disjoint"
    assert all(7 <= lo and hi < n for lo, hi in pairs)
    assert sorted(grid_map) == sorted(grid_map.values()), "not a bijection"
    assert all(b >= 10 and grid_map[b] >= 10 for b in grid_map)
    assert not (set(flat) & (set(grid_map) | set(grid_map.values())))
    grid_map = {b: s for b, s in grid_map.items() if b != s}
    sub = [p for p in pairs if p[0] < 10]
    grid_pairs = [p for p in pairs if p[0] >= 10]

    # Factored view, bit n-1 down to bit 10: every bit involved in any
    # pair gets its own axis; plain runs between collapse to one axis.
    special = sorted({h for _, h in sub if h >= 10}
                     | {b for p in grid_pairs for b in p}
                     | set(grid_map) | set(grid_map.values()),
                     reverse=True)
    shape: list[int] = []
    axis_of_bit: dict[int, int] = {}
    plain_axes: list[int] = []
    cur = 0
    for b in range(n - 1, 9, -1):
        if b in special:
            if cur:
                shape.append(1 << cur)
                plain_axes.append(len(shape) - 1)
                cur = 0
            shape.append(2)
            axis_of_bit[b] = len(shape) - 1
        else:
            cur += 1
    if cur:
        shape.append(1 << cur)
        plain_axes.append(len(shape) - 1)
    lead_rank = len(shape)
    shape += [8, 128]

    # Blocks: sub-pair partner axes ride whole (their exchange is
    # in-kernel); grid-pair bits and plain axes are gridded, with a
    # block factor on the lowest plain axis to amortize grid steps.
    sub_hi_axes = {axis_of_bit[h] for _, h in sub if h >= 10}
    block = [1] * lead_rank + [8, 128]
    base = 8 * 128 * (1 << len(sub_hi_axes))
    for ax in sub_hi_axes:
        block[ax] = 2
    bf = max(1, block_elems // base)
    if plain_axes:
        ax = plain_axes[-1]
        block[ax] = min(shape[ax], bf)
    # Flattened single grid dim: axis i contributes log2(extent_i) bits.
    shifts: list[tuple[int, int, int]] = []  # (axis, shift, mask)
    gbits = 0
    for ax in range(lead_rank - 1, -1, -1):
        ext = shape[ax] // block[ax]
        if ext > 1:
            shifts.append((ax, gbits, ext - 1))
            gbits += ext.bit_length() - 1
    G = 1 << gbits
    # Input axis source map: axis of out bit b reads the decoded
    # coordinate of the axis of in bit (pairs swap; grid_map arbitrary).
    src_axis = {}
    for a, b in grid_pairs:
        src_axis[axis_of_bit[a]] = axis_of_bit[b]
        src_axis[axis_of_bit[b]] = axis_of_bit[a]
    for b, s in grid_map.items():
        src_axis[axis_of_bit[b]] = axis_of_bit[s]

    def _decode(g):
        idx = [0] * (lead_rank + 2)
        for ax, sh, mask in shifts:
            idx[ax] = (g >> sh) & mask
        return idx

    def out_map(g):
        return tuple(_decode(g))

    def in_map(g):
        idx = _decode(g)
        snap = list(idx)
        for ax, other in src_axis.items():
            idx[ax] = snap[other]
        return tuple(idx)

    # Kernel shape: split the 8-axis into (2,2,2) = bits (9,8,7).
    kblock = [b for b in block[:lead_rank]] + [2, 2, 2, 128]
    sub_axis_of_bit = dict(axis_of_bit)
    for b_, off in ((9, 0), (8, 1), (7, 2)):
        sub_axis_of_bit[b_] = lead_rank + off
    ax_pairs = tuple(
        (sub_axis_of_bit[lo], sub_axis_of_bit[hi]) for lo, hi in sub)

    spec_in = pl.BlockSpec(tuple(block), in_map, memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec(tuple(block), out_map,
                            memory_space=pltpu.VMEM)
    vshape = tuple(shape)

    def one(x):
        kern = functools.partial(_bitperm_swap_one_kernel,
                                 kshape=tuple(kblock), ax_pairs=ax_pairs)
        return pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[spec_in],
            out_specs=spec_out,
            out_shape=jax.ShapeDtypeStruct(vshape, x.dtype),
            interpret=interpret,
        )(x.reshape(vshape)).reshape(x.size)

    if split_planes:
        # Capacity tier: one plane at a time keeps peak liveness at 3
        # planes (12 GiB at n=30); the barrier stops XLA overlapping
        # the two out-of-place passes.
        ore = one(re)
        ore, im = jax.lax.optimization_barrier((ore, im))
        return ore, one(im)

    kern = functools.partial(_bitperm_swap_kernel,
                             kshape=tuple(kblock), ax_pairs=ax_pairs)
    ore, oim = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[spec_in, spec_in],
        out_specs=[spec_out, spec_out],
        out_shape=[jax.ShapeDtypeStruct(vshape, re.dtype)] * 2,
        interpret=interpret,
    )(re.reshape(vshape), im.reshape(vshape))
    return ore.reshape(re.size), oim.reshape(im.size)


def _bitperm_swap_one_kernel(x_ref, o_ref, *, kshape, ax_pairs):
    # Single-plane variant of _bitperm_swap_kernel (split_planes mode).
    if not ax_pairs:
        o_ref[:] = x_ref[:]
        return
    o_ref[:] = _axis_exchange(x_ref[:], x_ref.shape, kshape, ax_pairs)


def _transpose_cross_kernel(re_ref, im_ref, ore_ref, oim_ref, *, bm):
    # Mosaic's native tile transpose: measured 768 GB/s on v5e vs 333
    # for the two-permutation-matmul form (_bitperm_cross_kernel).
    for ref, oref in ((re_ref, ore_ref), (im_ref, oim_ref)):
        for j in range(bm):
            oref[:, j, :] = ref[:, j, :].T


def bitperm_transpose_planar(
    re: jnp.ndarray,
    im: jnp.ndarray,
    *,
    interpret: bool = False,
    inplace: bool = False,
):
    """Pure in-order lane<->top field exchange: lane l <-> bit n-7+l.

    The (128, M, 128) view's tiles transpose in-VMEM on Mosaic's
    native transpose path; identity index maps make the pass
    aliasing-safe (``inplace`` costs ZERO extra HBM at capacity).  Any
    general crossing ``sigma`` factors as A∘T with A = within-field bit
    permutations (lane part folds into the last lane panel's W; top
    part rides :func:`bitperm_swap_planar`'s index maps) and T = this
    kernel — see ``circuit/panelize._decompose_terminal_bitperm``.
    """
    n = int(np.log2(re.size))
    assert n >= 14, "transpose crossing needs the (128, M, 128) view"
    M = 1 << (n - 14)
    BM = 8 if M >= 8 else M
    spec = pl.BlockSpec((128, BM, 128), lambda m: (0, m, 0),
                        memory_space=pltpu.VMEM)
    ore, oim = pl.pallas_call(
        functools.partial(_transpose_cross_kernel, bm=BM),
        grid=(M // BM,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((128, M, 128), re.dtype)] * 2,
        input_output_aliases={0: 0, 1: 1} if inplace else {},
        interpret=interpret,
    )(re.reshape(128, M, 128), im.reshape(128, M, 128))
    return ore.reshape(re.size), oim.reshape(im.size)


def _transpose_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:].T


def tiled_transpose(x: jnp.ndarray, rows: int, cols: int, *,
                    tile: int = 128, interpret: bool = False) -> jnp.ndarray:
    """(rows, cols) -> (cols, rows) transpose via 128x128 VMEM tiles.

    The rotation primitive of the sliding-panel schedule; XLA's own
    transpose measured 188 GB/s on v5e — this kernel targets the
    elementwise ceiling.
    """
    assert rows % tile == 0 and cols % tile == 0
    out = pl.pallas_call(
        _transpose_kernel,
        grid=(rows // tile, cols // tile),
        in_specs=[pl.BlockSpec((tile, tile), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cols, rows), x.dtype),
        interpret=interpret,
    )(x.reshape(rows, cols))
    return out


def to_planar(psi: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    f = jnp.float64 if psi.dtype == jnp.complex128 else jnp.float32
    return jnp.real(psi).astype(f), jnp.imag(psi).astype(f)


def from_planar(re: jnp.ndarray, im: jnp.ndarray, dtype=jnp.complex64) -> jnp.ndarray:
    return jax.lax.complex(re, im).astype(dtype)
