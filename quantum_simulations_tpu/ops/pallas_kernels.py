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

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HI = jax.lax.Precision.HIGHEST
_DN = (((1,), (1,)), ((), ()))  # contract dim1 x dim1: a @ b.T


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


def _panel_kernel(re_ref, im_ref, wr_ref, wi_ref, ore_ref, oim_ref, *,
                  rotate: bool):
    re = re_ref[:]
    im = im_ref[:]
    wr = wr_ref[:]
    wi = wi_ref[:]
    o_re = (jax.lax.dot_general(re, wr, _DN, precision=HI)
            - jax.lax.dot_general(im, wi, _DN, precision=HI))
    o_im = (jax.lax.dot_general(re, wi, _DN, precision=HI)
            + jax.lax.dot_general(im, wr, _DN, precision=HI))
    if rotate:
        ore_ref[:] = o_re.T
        oim_ref[:] = o_im.T
    else:
        ore_ref[:] = o_re
        oim_ref[:] = o_im


def panel_apply_planar(
    re: jnp.ndarray,
    im: jnp.ndarray,
    W: np.ndarray,
    *,
    rotate: bool = False,
    block_rows: int = 1024,
    interpret: bool = False,
):
    """Apply a 2^w-wide fused panel to planar f32 state (flat arrays).

    ``rotate=True`` additionally rotates index bits right by w (the
    panel scheduler's stage transition) inside the same pass: the
    output tile is written transposed, so the flat result is already
    in rotated order.
    """
    wr, wi = _w_planes(W, re.dtype)
    dim = wr.shape[0]
    N = re.size
    R = N // dim
    BR = _block_rows(R, block_rows)
    fdtype = re.dtype

    kern = functools.partial(_panel_kernel, rotate=rotate)
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

    ore, oim = pl.pallas_call(
        kern,
        grid=(R // BR,),
        in_specs=[
            pl.BlockSpec((BR, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(re.reshape(R, dim), im.reshape(R, dim), wr, wi)
    return ore.reshape(N), oim.reshape(N)


def _positioned_kernel(re_ref, im_ref, wr_ref, wi_ref, ore_ref, oim_ref):
    # Blocks are (BA, dim, CB); contract the middle axis with W.
    re = re_ref[:]
    im = im_ref[:]
    wr = wr_ref[:]
    wi = wi_ref[:]

    def mm(w, x):
        return jnp.einsum("ij,bjc->bic", w, x, precision=HI)

    ore_ref[:] = mm(wr, re) - mm(wi, im)
    oim_ref[:] = mm(wi, re) + mm(wr, im)


def positioned_panel_planar(
    re: jnp.ndarray,
    im: jnp.ndarray,
    W: np.ndarray,
    pos: int,
    *,
    col_block: int = 512,
    batch_block: int = 8,
    interpret: bool = False,
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
    C = 1 << pos
    A = N // (dim * C)
    assert pos >= 7 or interpret, "positioned panel needs pos >= 7 on TPU"
    fdtype = re.dtype
    itemsize = np.dtype(fdtype).itemsize
    # VMEM budget: 4 live blocks (2 in + 2 out planes), double-buffered
    # by the pipeline, inside the 16 MB scoped limit -> keep each block
    # <= 512 KiB (1 MiB blocks overflowed via einsum temps).  Spend the
    # budget on batch rows when A is large, on columns when A is small
    # (at pos near the top A -> 1 and wide CB is the only way to keep
    # per-grid-step DMA efficient).
    # Mosaic pads the contraction dim to the 128-wide MXU, so budget
    # with the PADDED dim (a 32-wide panel at CB=4096 hit 22 MB scoped).
    max_elems = max((1 << 19) // (itemsize * max(dim, 128)), 128)
    BA = min(batch_block, A, max(1, max_elems // 128))
    while A % BA:
        BA //= 2
    CB = min(col_block * batch_block // BA if col_block else C,
             max_elems // BA, C)
    while C % CB:
        CB //= 2
    CB = max(CB, min(128, C))

    ore, oim = pl.pallas_call(
        _positioned_kernel,
        grid=(A // BA, C // CB),
        in_specs=[
            pl.BlockSpec((BA, dim, CB), lambda a, c: (a, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BA, dim, CB), lambda a, c: (a, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, dim), lambda a, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, dim), lambda a, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BA, dim, CB), lambda a, c: (a, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BA, dim, CB), lambda a, c: (a, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((A, dim, C), fdtype)] * 2,
        interpret=interpret,
    )(re.reshape(A, dim, C), im.reshape(A, dim, C), wr, wi)
    return ore.reshape(N), oim.reshape(N)


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
