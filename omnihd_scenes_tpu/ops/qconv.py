"""Fused int8 3x3 convolution Pallas kernel (stride 1, SAME).

Why this exists: the XLA path for a quantized conv cannot fuse the
elementwise quant/dequant chains into the convolution, and the
s8xs8 conv materializes an **int32** output in HBM (2x the bytes of
bf16).  Measured end-to-end on the flagship model that turns the 2x
int8 MXU rate (v5e: 394 vs 197 TOPS) into a net LOSS (BENCH.md).  This
kernel keeps the s32 accumulator in VMEM and applies the whole
epilogue (per-channel scale, bias/BN fold, ReLU) before storing bf16,
so HBM sees only the s8 input and the bf16 output.

Formulation — shifted matmuls over a flattened pixel axis:

The input is zero-padded to (H+2, W+2, C) and flattened to
``X[(H+2)*(W+2), C]``.  Output pixels live on an (H, W+2) grid
flattened the same way (columns W and W+1 are seam garbage, sliced off
by the wrapper).  For tap (dy, dx) every output pixel q reads input
row ``q + dy*(W+2) + dx`` — i.e. the whole tap is ONE matmul of a
sublane-shifted view of X against the (C, Co) tap weight:

    out[q, :] = sum_{dy,dx} X[q + dy*(W+2) + dx, :] @ W[dy, dx, :, :]

The kernel runs one image per grid step (the whole s8 image fits VMEM
comfortably), loops over 512-row output chunks, and per chunk issues 9
MXU dots (512, C) @ (C, Co) accumulating in s32/f32 VMEM.  ~7.5% of
the MACs land on seam columns — the price of never reshaping or
relayouting (sublane-shifted slices of a flat 2D array are native).

Reference counterpart: the CUDA/TensorRT int8 deployment path of the
reference ecosystem (TRT symbolics in
``projects/mmdet3d_plugin/ops/bev_pool_v2/bev_pool.py:94-130``); the
PTQ scheme itself lives in ``omnihd_scenes_tpu.models.quant``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 512          # output rows per inner step (mult. of 32: s8 tile)


def _kernel(x_ref, w_ref, sc_ref, sh_ref, o_ref, *, wp, n_chunks, relu):
    """One image: x_ref (1, 3, Mx, C) s8 (the 3 dx-shifted copies —
    Mosaic requires dynamic sublane offsets provably 8-aligned, so the
    dx in-row shift is materialized outside and only the 8-aligned
    ``dy*wp`` offset is applied in-kernel), w_ref (9, C, Co) s8,
    sc_ref/sh_ref (1, Co) f32, o_ref (1, n_chunks*_CHUNK, Co) bf16."""
    scale = sc_ref[0, :]
    shift = sh_ref[0, :]

    def body(m, _):
        q0 = m * _CHUNK
        acc = jnp.zeros((_CHUNK, o_ref.shape[-1]), jnp.int32)
        for t in range(9):                      # static unroll: 9 taps
            xs = x_ref[0, t % 3, pl.ds(q0 + (t // 3) * wp, _CHUNK), :]
            acc += jax.lax.dot_general(
                xs, w_ref[t], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * scale[None, :] + shift[None, :]
        if relu:
            y = jnp.maximum(y, 0.0)
        o_ref[0, pl.ds(q0, _CHUNK), :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0, unroll=False)


def qconv3x3(x8, w8, scale, shift, *, relu=True, interpret=False):
    """Fused s8 3x3 SAME conv + per-channel affine (+ReLU), bf16 out.

    Args:
      x8:    (N, H, W, C) int8 activations (pre-quantized).
      w8:    (3, 3, C, Co) int8 weights.
      scale: (Co,) f32 — folds act scale * weight scale * BN scale.
      shift: (Co,) f32 — folds conv bias + BN shift.
    Returns (N, H, W, Co) bfloat16.
    """
    n, h, w, c = x8.shape
    co = w8.shape[-1]
    # Row stride must be a multiple of 8 so the in-kernel dy*wp sublane
    # offsets are provably aligned; columns [w, wp) are seam garbage.
    wp = -(-(w + 2) // 8) * 8
    m_out = h * wp
    n_chunks = -(-m_out // _CHUNK)
    # Input rows the last chunk may touch: n_chunks*_CHUNK + max tap
    # offset (2*wp), +2 for the dx shift; pad so slices stay in bounds.
    m_x = n_chunks * _CHUNK + 2 * wp

    xf = jnp.pad(x8, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    xf = xf.reshape(n, (h + 2) * wp, c)
    xf = jnp.pad(xf, ((0, 0), (0, m_x + 2 - (h + 2) * wp), (0, 0)))
    # The three dx-shifted copies (dx handled outside the kernel).
    x3 = jnp.stack([xf[:, dx:dx + m_x] for dx in range(3)], axis=1)
    wf = w8.reshape(9, c, co)

    out = pl.pallas_call(
        functools.partial(_kernel, wp=wp, n_chunks=n_chunks, relu=relu),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 3, m_x, c), lambda i: (i, 0, 0, 0),
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
            bytes_accessed=x3.size + wf.size + 8 * co
            + n * m_out * co * 2,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x3, wf, scale.reshape(1, co).astype(jnp.float32),
      shift.reshape(1, co).astype(jnp.float32))

    out = out[:, :m_out, :].reshape(n, h, wp, co)
    return out[:, :, :w, :]


def quantize_act(x, amax):
    """Symmetric per-tensor activation quantization -> (x8, sx)."""
    sx = jnp.maximum(amax.astype(jnp.float32), 1e-6) / 127.0
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                  -127, 127).astype(jnp.int8)
    return x8, sx


def quantize_weights(kernel):
    """Per-output-channel symmetric weight quantization -> (w8, sw)."""
    kf = kernel.astype(jnp.float32)
    sw = jnp.maximum(
        jnp.max(jnp.abs(kf), axis=tuple(range(kf.ndim - 1))) / 127.0,
        1e-12)
    w8 = jnp.clip(jnp.round(kf / sw), -127, 127).astype(jnp.int8)
    return w8, sw


def qconv3x3_bn_relu(x, kernel, amax, bn_scale, bn_shift, *, relu=True,
                     bias=None, interpret=False):
    """Float-in/float-out convenience: quantize, run the fused kernel.

    Computes ``relu(bn_scale * conv3x3(x, kernel) + bn_shift [+ bias
    folded])`` with s8 MXU arithmetic.  ``bn_scale``/``bn_shift`` are
    the inference-time BatchNorm affine (gamma/sqrt(var+eps),
    beta - mean*that); pass ones/zeros for a plain conv.
    """
    x8, sx = quantize_act(x, amax)
    w8, sw = quantize_weights(kernel)
    scale = sx * sw * bn_scale.astype(jnp.float32)
    shift = bn_shift.astype(jnp.float32)
    if bias is not None:
        shift = shift + bn_scale.astype(jnp.float32) * bias.astype(
            jnp.float32)
    return qconv3x3(x8, w8, scale, shift, relu=relu, interpret=interpret)
