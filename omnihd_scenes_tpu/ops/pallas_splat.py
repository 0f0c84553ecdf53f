"""Fused TPU Pallas kernels for the LSS sampling view transform.

Companion to :mod:`omnihd_scenes_tpu.ops.lss_project` (see its module
docstring for the math).  The einsum implementation materializes the
pass-1/pass-2 one-hot tensors in HBM (~170 MB per camera at production
scale) and lets XLA lower the contractions, which measures ~29 ms per
sample; these kernels build the one-hot operands *in VMEM* from iota
comparisons right next to the MXU dots, so HBM only ever sees the
camera features, the int32 index fields, and the (much smaller)
intermediate.

Kernel A (pass 1, grid (cam, image-row j, z-slice k)):
    inter[n, j, k, b, :] = fp[n, j, i_star[n, j, k, b], :]
  as ``onehot(i_star) @ fp_row`` — one (n_b x fW) @ (fW x C) dot per
  step, feat and depth channel blocks kept separate so no kernel ever
  slices the lane dimension (Mosaic requires 128-aligned lane slices).

Kernel B (pass 2 + depth select, grid (k, b-chunk, cam)):
    out[k, b, g, :] += feat_taps[j_star] * depth_taps[j_star][kd_star]
  with the camera dimension innermost so the output block is revisited
  consecutively and accumulated in VMEM (zero-initialized at cam 0).

The backward pass reuses the einsum implementation's VJP via
``jax.custom_vjp`` — both implementations compute the same function
(verified to tolerance in tests/test_pallas_splat.py).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TB = 16        # b-values per kernel-B step


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pass1_kernel(i_ref, f_ref, d_ref, of_ref, od_ref, *, f_w):
    nz, nbp = i_ref.shape[2], i_ref.shape[3]
    iota = jax.lax.broadcasted_iota(jnp.int32, (nbp, f_w), 1)
    src_f = f_ref[0, 0]
    src_d = d_ref[0, 0]
    for k in range(nz):                                # static unroll
        idx = i_ref[0, 0, k, :]                        # (NBP,) int32
        onehot = (idx[:, None] == iota).astype(jnp.bfloat16)
        of_ref[0, 0, k] = jnp.dot(
            onehot, src_f, preferred_element_type=jnp.float32
        ).astype(of_ref.dtype)
        od_ref[0, 0, k] = jnp.dot(
            onehot, src_d, preferred_element_type=jnp.float32
        ).astype(od_ref.dtype)


def _pass2_kernel(j_ref, kd_ref, if_ref, id_ref, out_ref, *, f_h, cd):
    n = pl.program_id(2)

    @pl.when(n == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    iota_d = jax.lax.broadcasted_iota(
        jnp.int32, (out_ref.shape[2], cd), 1)
    for b in range(_TB):                               # static unroll
        jdx = j_ref[0, 0, b, :]                        # (NG,)
        iota_j = jax.lax.broadcasted_iota(
            jnp.int32, (jdx.shape[0], f_h), 1)
        onehot = (jdx[:, None] == iota_j).astype(jnp.bfloat16)
        outf = jnp.dot(onehot, if_ref[0, :, 0, b, :],
                       preferred_element_type=jnp.float32)   # (NG, CF)
        outd = jnp.dot(onehot, id_ref[0, :, 0, b, :],
                       preferred_element_type=jnp.float32)   # (NG, CD)
        kd = kd_ref[0, 0, b, :]
        w = jnp.sum(outd * (kd[:, None] == iota_d), axis=-1)
        out_ref[0, b] += outf * w[:, None]


def _group_forward(fp_feat, fp_depth, i_star, j_star, kd_star):
    """Run both kernels for one camera group.

    Shapes (all padded): fp_feat (G, fH, fW, CF) bf16, fp_depth
    (G, fH, fW, CD) bf16, i_star (G, fH, nz, NBP) int32,
    j_star/kd_star (G, nz, NBP, NG) int32.
    Returns out (nz, NBP, NG, CF) float32.
    """
    g_n, f_h, f_w, cf = fp_feat.shape
    cd = fp_depth.shape[-1]
    nz, nbp = i_star.shape[2], i_star.shape[3]
    ng = j_star.shape[-1]

    inter_shape = jax.ShapeDtypeStruct((g_n, f_h, nz, nbp, cf),
                                       jnp.bfloat16)
    interd_shape = jax.ShapeDtypeStruct((g_n, f_h, nz, nbp, cd),
                                        jnp.bfloat16)
    inter_f, inter_d = pl.pallas_call(
        functools.partial(_pass1_kernel, f_w=f_w),
        grid=(g_n, f_h),
        in_specs=[
            pl.BlockSpec((1, 1, nz, nbp), lambda n, j: (n, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, f_w, cf), lambda n, j: (n, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, f_w, cd), lambda n, j: (n, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, nz, nbp, cf),
                         lambda n, j: (n, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nz, nbp, cd),
                         lambda n, j: (n, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[inter_shape, interd_shape],
        cost_estimate=pl.CostEstimate(
            flops=2 * g_n * f_h * nz * nbp * f_w * (cf + cd),
            bytes_accessed=(fp_feat.size + fp_depth.size) * 2 * nz
            + (g_n * f_h * nz * nbp) * (4 + 2 * (cf + cd)),
            transcendentals=0),
    )(i_star, fp_feat, fp_depth)

    out = pl.pallas_call(
        functools.partial(_pass2_kernel, f_h=f_h, cd=cd),
        grid=(nz, nbp // _TB, g_n),
        in_specs=[
            pl.BlockSpec((1, 1, _TB, ng), lambda k, bc, n: (n, k, bc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _TB, ng), lambda k, bc, n: (n, k, bc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_h, 1, _TB, cf),
                         lambda k, bc, n: (n, 0, k, bc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_h, 1, _TB, cd),
                         lambda k, bc, n: (n, 0, k, bc, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TB, ng, cf),
                               lambda k, bc, n: (k, bc, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nz, nbp, ng, cf), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * g_n * nz * nbp * ng * f_h * (cf + cd),
            bytes_accessed=inter_f.size * 2 + inter_d.size * 2
            + nz * nbp * ng * (8 + 4 * cf),
            transcendentals=0),
    )(j_star, kd_star, inter_f, inter_d)
    return out


def sample_bev_pallas(depth, feat, minv, mt, geom, solve_x: Sequence[bool],
                      einsum_ref=None):
    """Pallas forward of the sampling view transform.

    Args match :func:`omnihd_scenes_tpu.ops.lss_project.lss_sample_bev`
    after geometry preprocessing (``minv = inv(rots)``,
    ``mt = -minv @ trans``); ``geom`` is the ``_Geom`` bundle.
    ``einsum_ref(depth, feat)`` supplies the backward pass (the XLA
    implementation's VJP).
    """
    from omnihd_scenes_tpu.ops.lss_project import _sample_indices

    n_cams, f_h, f_w, d_bins = depth.shape
    c_ch = feat.shape[-1]
    nz, ny, nx = geom.nz, geom.ny, geom.nx
    cf = _round_up(c_ch, 64)
    cd = _round_up(d_bins, 64)

    def forward(depth_in, feat_in):
        fp_feat = jnp.pad(feat_in, ((0, 0),) * 3 + ((0, cf - c_ch),)
                          ).astype(jnp.bfloat16)
        fp_depth = jnp.pad(depth_in, ((0, 0),) * 3 + ((0, cd - d_bins),)
                           ).astype(jnp.bfloat16)
        acc = jnp.zeros((nz, ny, nx, c_ch), jnp.float32)
        for sx in (True, False):
            cams = [n for n, s in enumerate(solve_x) if s == sx]
            if not cams:
                continue
            n_b = ny if sx else nx
            n_g = nx if sx else ny
            nbp = _round_up(n_b, _TB)
            idx = [_sample_indices(minv[n], mt[n], sx, geom)
                   for n in cams]
            pad_b = nbp - n_b
            i_star = jnp.stack([
                jnp.pad(i, ((0, 0), (0, 0), (0, pad_b)),
                        constant_values=-1)
                for i, _, _ in idx])              # (G, fH, nz, NBP)
            j_star = jnp.stack([
                jnp.pad(j, ((0, 0), (0, pad_b), (0, 0)),
                        constant_values=-1) for _, j, _ in idx])
            kd_star = jnp.stack([
                jnp.pad(k, ((0, 0), (0, pad_b), (0, 0)),
                        constant_values=-1) for _, _, k in idx])
            # Static per-camera slices (constant fancy indexing lowers
            # to a real gather on this backend — pathologically slow).
            out = _group_forward(
                jnp.stack([fp_feat[c] for c in cams]),
                jnp.stack([fp_depth[c] for c in cams]),
                i_star, j_star, kd_star)
            out = out[:, :n_b, :, :c_ch]          # (nz, n_b, n_g, C)
            acc = acc + (out if sx else out.transpose(0, 2, 1, 3))
        return acc

    if einsum_ref is None:
        return forward(depth, feat)

    @jax.custom_vjp
    def f(d, ft):
        return forward(d, ft)

    f.defvjp(lambda d, ft: (forward(d, ft), (d, ft)),
             lambda res, g: jax.vjp(einsum_ref, *res)[1](g))
    return f(depth, feat)
