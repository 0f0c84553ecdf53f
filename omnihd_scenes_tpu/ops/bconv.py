"""Fused bf16 3x3 convolution Pallas kernel (stride 1, SAME, dilation).

STATUS: measured NEGATIVE result, kept as the documented probe.  On the
v5e (round 3, BENCH.md): this kernel runs the DepthNet production shape
(6, 136, 240, 256)->256 at 4.34 ms = 53 TFLOP/s vs XLA's conv at
2.70 ms = 86 TFLOP/s — **0.62x**.  The limiter is the Mosaic toolchain
itself: bf16 ``dot_general`` inside ANY pallas kernel caps at
~53 TFLOP/s on this stack (probed standalone at 1024x1024x1024: 52.6),
mirroring round 2's s8 finding (Mosaic ~80 vs XLA ~100 TOPS).  XLA's
conv engine is the fastest bf16 conv path available on this chip; a
hand kernel can only win where it removes HBM round-trips that XLA
cannot fuse (e.g. the int8 quant/dequant chains of ``ops/qconv.py``),
never on raw MXU throughput.

Formulation (kept correct + tested for future toolchains): 9 MXU dots
over a flattened pixel axis, one padded flat input copy; per (chunk,
dy) one 8-aligned load, the three dx taps as STATIC in-register slices
(static sublane shifts need no alignment proof — this also avoids
qconv's x3 HBM copies, which overflow the 128 MB VMEM in bf16 under
double-buffered windows).  f32 VMEM accumulator; BN affine + ReLU
epilogue fused before the bf16 store.  ``dilation`` d taps at
{0, d, 2d} serve the ASPP branches (d=6/12/18) as well as d=1 trunks.

Reference counterpart: the conv trunks of
``cam_stream_lss_bevpoolv2_depthnet.py:537-608`` (DepthNet + ASPP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 512          # output rows per inner step (bf16 tile: mult of 16)


def _kernel(x_ref, w_ref, sc_ref, sh_ref, o_ref, *, wp, n_chunks, relu,
            dil):
    """One image: x_ref (1, Mx, C) bf16 — a SINGLE padded flat copy
    (unlike qconv's 3 dx-shifted copies: bf16 at production scale blows
    the 128 MB VMEM with x3 double-buffered windows, and the HBM-side
    pad/stack passes were qconv's measured overhead).  Per (chunk, dy)
    ONE 8-aligned load grabs _CHUNK + pad rows; the three dx taps are
    STATIC in-register slices of that value (Mosaic lowers static
    sublane shifts natively — only *dynamic* offsets need alignment).
    w_ref (9, C, Co) bf16, sc/sh (1, Co) f32, o_ref (1, M, Co) bf16."""
    scale = sc_ref[0, :]
    shift = sh_ref[0, :]
    ext = -(-(2 * dil) // 8) * 8               # aligned dx-slice slack

    def body(m, _):
        q0 = m * _CHUNK
        acc = jnp.zeros((_CHUNK, o_ref.shape[-1]), jnp.float32)
        for dy in range(3):
            big = x_ref[0, pl.ds(q0 + dy * dil * wp, _CHUNK + ext), :]
            for dx in range(3):
                xs = jax.lax.slice_in_dim(big, dx * dil,
                                          dx * dil + _CHUNK, axis=0)
                acc += jax.lax.dot_general(
                    xs, w_ref[dy * 3 + dx], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        y = acc * scale[None, :] + shift[None, :]
        if relu:
            y = jnp.maximum(y, 0.0)
        o_ref[0, pl.ds(q0, _CHUNK), :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0, unroll=False)


def bconv3x3(x, w, scale=None, shift=None, *, relu=True, dilation=1,
             interpret=False):
    """Fused bf16 3x3 SAME conv + per-channel affine (+ReLU).

    Args:
      x: (N, H, W, C) bf16 (or castable) activations.
      w: (3, 3, C, Co) weights.
      scale: (Co,) f32 — BN gamma/sqrt(var+eps); ones when None.
      shift: (Co,) f32 — conv bias + BN shift; zeros when None.
      dilation: kernel dilation d (taps at {0, d, 2d}).
    Returns (N, H, W, Co) bfloat16.
    """
    n, h, wd, c = x.shape
    co = w.shape[-1]
    d = int(dilation)
    x = x.astype(jnp.bfloat16)
    w = w.astype(jnp.bfloat16)
    scale = (jnp.ones((co,), jnp.float32) if scale is None
             else scale.astype(jnp.float32))
    shift = (jnp.zeros((co,), jnp.float32) if shift is None
             else shift.astype(jnp.float32))

    # Row stride: multiple of 8 so dy*d*wp sublane offsets are provably
    # aligned; columns [wd, wp) are seam garbage sliced off at the end.
    wp = -(-(wd + 2 * d) // 8) * 8
    m_out = h * wp
    n_chunks = -(-m_out // _CHUNK)
    ext = -(-(2 * d) // 8) * 8                 # dx-slice slack per load
    m_x = n_chunks * _CHUNK + 2 * d * wp + ext

    xf = jnp.pad(x, ((0, 0), (d, d), (d, wp - wd - d), (0, 0)))
    xf = xf.reshape(n, (h + 2 * d) * wp, c)
    pad_rows = m_x - (h + 2 * d) * wp
    xf = jnp.pad(xf, ((0, 0), (0, max(pad_rows, 0), ), (0, 0)))
    wf = w.reshape(9, c, co)

    out = pl.pallas_call(
        functools.partial(_kernel, wp=wp, n_chunks=n_chunks, relu=relu,
                          dil=d),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, m_x, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, co), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_chunks * _CHUNK, co),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n_chunks * _CHUNK, co),
                                       jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m_out * 9 * c * co,
            bytes_accessed=xf.size * 2 + wf.size * 2 + 8 * co
            + n * m_out * co * 2,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(xf, wf, scale.reshape(1, co), shift.reshape(1, co))

    out = out[:, :m_out, :].reshape(n, h, wp, co)
    return out[:, :, :wd, :]


def bconv3x3_reference(x, w, scale=None, shift=None, *, relu=True,
                       dilation=1):
    """XLA reference with identical arithmetic types (bf16 in, f32
    accumulate, affine epilogue) for parity tests."""
    co = w.shape[-1]
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1),
        [(dilation, dilation)] * 2 if False else 'SAME',
        rhs_dilation=(dilation, dilation),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32)
    scale = (jnp.ones((co,), jnp.float32) if scale is None
             else scale.astype(jnp.float32))
    shift = (jnp.zeros((co,), jnp.float32) if shift is None
             else shift.astype(jnp.float32))
    y = y * scale + shift
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(jnp.bfloat16)
