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
    dim = W.shape[0]
    N = re.size
    R = N // dim
    BR = _block_rows(R, block_rows)
    wr = np.ascontiguousarray(W.real, dtype=np.float32)
    wi = np.ascontiguousarray(W.imag, dtype=np.float32)

    kern = functools.partial(_panel_kernel, rotate=rotate)
    if rotate:
        out_specs = [
            pl.BlockSpec((dim, BR), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, BR), lambda i: (0, i), memory_space=pltpu.VMEM),
        ]
        out_shape = [jax.ShapeDtypeStruct((dim, R), jnp.float32)] * 2
    else:
        out_specs = [
            pl.BlockSpec((BR, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        out_shape = [jax.ShapeDtypeStruct((R, dim), jnp.float32)] * 2

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
    )(re.reshape(R, dim), im.reshape(R, dim),
      jnp.asarray(wr), jnp.asarray(wi))
    return ore.reshape(N), oim.reshape(N)


def to_planar(psi: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    return jnp.real(psi).astype(jnp.float32), jnp.imag(psi).astype(jnp.float32)


def from_planar(re: jnp.ndarray, im: jnp.ndarray, dtype=jnp.complex64) -> jnp.ndarray:
    return jax.lax.complex(re, im).astype(dtype)
