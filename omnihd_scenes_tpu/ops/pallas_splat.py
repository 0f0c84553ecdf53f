"""Fused TPU Pallas kernels for the LSS sampling view transform.

Companion to :mod:`omnihd_scenes_tpu.ops.lss_project` (see its module
docstring for the math).  The einsum implementation materializes the
pass-1/pass-2 one-hot tensors in HBM (~0.8 GB per camera at production
scale) and lets XLA lower the contractions (~13 ms/sample); these
kernels build the one-hot operands *in VMEM* from iota comparisons
right next to the MXU dots, so HBM only ever sees the camera features,
the int32 index fields, and the bf16 intermediate.

Layout is the whole game here (the round-2 kernels lost to the einsum
because kernel B's input blocks shattered into fH 4 KB strided DMA
descriptors):

* feat and depth are packed into ONE lane dimension ``M = CF + CD``
  (each 64-aligned) so every dot carries both and no kernel slices
  lanes below 128; the depth bin is selected by a lane-iota mask.
* the intermediate is written directly in kernel B's preferred layout
  ``(cam, z, j, b, M)``: kernel A runs on grid (cam, j-chunk, z) with
  z innermost — the camera-feature block's index map ignores z, so it
  stays resident in VMEM across all z steps — and each grid step
  writes one contiguous (JC, NBP, M) slab.
* kernel B (grid (z, b-chunk, cam), cam innermost) reads
  (fH, TB, M) slabs — per image row one contiguous TB*M*2 ≈ 20 KB run
  — and accumulates the output block in VMEM across cameras
  (zero-initialized at cam 0).

Kernel A (pass 1):   inter[n, k, j, b, :] = fp[n, j, i_star, :]
  as one (NBP x fW) @ (fW x M) one-hot dot per image row.
Kernel B (pass 2 + depth select):
  out[k, b, g, :] += taps * taps[CF + kd_star]
  where taps = onehot(j_star) @ inter[n, k, :, b, :].

The backward pass reuses the einsum implementation's VJP via
``jax.custom_vjp`` — both implementations compute the same function
(verified to tolerance in tests/test_pallas_splat.py).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TB = 80        # b-values per kernel-B step (divides padded NBP)
_KZ = 4         # z-slices per kernel-A step


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _chunk(n: int, target: int) -> int:
    """Largest divisor of n that is <= target and 8-aligned (Mosaic
    requires second-minor block dims divisible by 8 unless full)."""
    if n <= target:
        return n
    c = min(n, target) // 8 * 8
    while c > 8 and n % c:
        c -= 8
    return c if c >= 8 and n % c == 0 else n


def _pass1_kernel(i_ref, f_ref, o_ref, *, f_w, jc, kz):
    for kk in range(kz):                               # static unroll
        for jj in range(jc):
            idx = i_ref[0, kk, jj, :]                  # (NBP,) int32
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (idx.shape[0], f_w), 1)
            onehot = (idx[:, None] == iota).astype(jnp.bfloat16)
            o_ref[0, kk, jj] = jnp.dot(
                onehot, f_ref[0, jj], preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)


def _pass2_kernel(j_ref, kd_ref, i_ref, out_ref, *, f_h, c_f, tb):
    n = pl.program_id(2)

    @pl.when(n == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    ng, m = out_ref.shape[2], out_ref.shape[3]
    # Depth lanes sit at [c_f, c_f + CD); lane c_f + kd is the bin.
    lane_d = jax.lax.broadcasted_iota(jnp.int32, (ng, m), 1) - c_f
    for b in range(tb):                                # static unroll
        jdx = j_ref[0, 0, b, :]                        # (NG,)
        iota_j = jax.lax.broadcasted_iota(jnp.int32, (ng, f_h), 1)
        onehot = (jdx[:, None] == iota_j).astype(jnp.bfloat16)
        taps = jnp.dot(onehot, i_ref[0, 0, :, b, :],
                       preferred_element_type=jnp.float32)    # (NG, M)
        kd = kd_ref[0, 0, b, :]
        # Guard kd=-1 (invalid depth): lane c_f-1 has lane_d == -1 and
        # would otherwise select a FEATURE value as the depth weight.
        sel = (lane_d == kd[:, None]) & (kd[:, None] >= 0)
        w = jnp.sum(jnp.where(sel, taps, 0.0), axis=-1)
        out_ref[0, b] += (taps * w[:, None]).astype(out_ref.dtype)


def _group_forward(fp, i_star, j_star, kd_star, c_f):
    """Run both kernels for one camera group.

    Shapes (all padded): fp (G, fH, fW, M) bf16 with feat lanes
    [0, c_f) and depth lanes [c_f, M); i_star (G, nz, fH, NBP) int32;
    j_star/kd_star (G, nz, NBP, NG) int32.
    Returns out (nz, NBP, NG, M) bfloat16 (feat lanes carry the result;
    depth lanes carry garbage and are sliced off by the caller).
    """
    g_n, f_h, f_w, m = fp.shape
    nz, nbp = i_star.shape[1], i_star.shape[3]
    ng = j_star.shape[-1]
    jc = _chunk(f_h, 40)
    kz = _chunk(nz, _KZ)

    inter = pl.pallas_call(
        functools.partial(_pass1_kernel, f_w=f_w, jc=jc, kz=kz),
        grid=(g_n, f_h // jc, nz // kz),           # z innermost: fp block
        in_specs=[                                 # stays VMEM-resident
            pl.BlockSpec((1, kz, jc, nbp), lambda n, j, k: (n, k, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jc, f_w, m), lambda n, j, k: (n, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kz, jc, nbp, m),
                               lambda n, j, k: (n, k, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g_n, nz, f_h, nbp, m),
                                       jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * g_n * f_h * nz * nbp * f_w * m,
            bytes_accessed=fp.size * 2 + i_star.size * 4
            + g_n * nz * f_h * nbp * m * 2,
            transcendentals=0),
        # The unrolled dot chain's live temporaries put the kernel just
        # past the default 16 MB scoped-vmem budget when embedded in a
        # large graph (v5e has 128 MB physical VMEM).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
    )(i_star, fp)

    tb = _chunk(nbp, _TB)
    out = pl.pallas_call(
        functools.partial(_pass2_kernel, f_h=f_h, c_f=c_f, tb=tb),
        grid=(nz, nbp // tb, g_n),                 # cam innermost: output
        in_specs=[                                 # accumulates in VMEM
            pl.BlockSpec((1, 1, tb, ng), lambda k, bc, n: (n, k, bc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tb, ng), lambda k, bc, n: (n, k, bc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, f_h, tb, m),
                         lambda k, bc, n: (n, k, 0, bc, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tb, ng, m),
                               lambda k, bc, n: (k, bc, 0, 0),
                               memory_space=pltpu.VMEM),
        # bf16 accumulator: <= 6 camera contributions, and it halves
        # the VMEM footprint so TB=80 fits (the backward pass is the
        # f32 einsum VJP either way).
        out_shape=jax.ShapeDtypeStruct((nz, nbp, ng, m), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * g_n * nz * nbp * ng * f_h * m,
            bytes_accessed=inter.size * 2 + nz * nbp * ng * (8 + 2 * m),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
    )(j_star, kd_star, inter)
    return out


def sample_bev_pallas(depth, feat, minv, mt, geom, solve_x: Sequence[bool],
                      b_windows=None, einsum_ref=None):
    """Pallas forward of the sampling view transform.

    Args match :func:`omnihd_scenes_tpu.ops.lss_project.lss_sample_bev`
    after geometry preprocessing (``minv = inv(rots)``,
    ``mt = -minv @ trans``); ``geom`` is the ``_Geom`` bundle.
    ``b_windows`` (static per-camera (offset, width) FOV windows on the
    b axis) shrink every kernel proportionally; cameras are grouped by
    (solve_x, window) so kernel B's in-VMEM accumulation over the group
    stays valid.  ``einsum_ref(depth, feat, minv, mt)`` supplies the
    backward pass (the XLA implementation's VJP); it must take the
    geometry EXPLICITLY — (minv, mt) ride the custom_vjp residuals so
    no tracer is captured in a closure, keeping this op re-traceable
    under ``jax.checkpoint`` / ``nn.remat``.
    """
    from omnihd_scenes_tpu.ops.lss_project import _sample_indices

    n_cams, f_h, f_w, d_bins = depth.shape
    c_ch = feat.shape[-1]
    nz, ny, nx = geom.nz, geom.ny, geom.nx
    cf = _round_up(c_ch, 64)
    cd = _round_up(d_bins, 64)

    def forward(depth_in, feat_in, minv, mt):
        # Pack feat + depth into one lane dimension (no lane slicing in
        # the kernels; the depth bin is selected with a lane mask).
        fp = jnp.concatenate([
            jnp.pad(feat_in, ((0, 0),) * 3 + ((0, cf - c_ch),)),
            jnp.pad(depth_in, ((0, 0),) * 3 + ((0, cd - d_bins),)),
        ], axis=-1).astype(jnp.bfloat16)
        acc = jnp.zeros((nz, ny, nx, c_ch), jnp.float32)
        groups = {}
        for n, sx in enumerate(solve_x):
            win = ((0, ny if sx else nx) if b_windows is None
                   else b_windows[n])
            groups.setdefault((sx, tuple(win)), []).append(n)
        for (sx, (off, wd)), cams in groups.items():
            nbp = _round_up(wd, _TB)
            idx = [_sample_indices(minv[n], mt[n], sx, geom, (off, wd))
                   for n in cams]
            pad_b = nbp - wd
            # i_star (fH, nz, wd) -> (nz, fH, NBP): kernel A's z-major
            # layout (a tiny int32 transpose, done by XLA).
            i_star = jnp.stack([
                jnp.pad(i.transpose(1, 0, 2), ((0, 0), (0, 0), (0, pad_b)),
                        constant_values=-1)
                for i, _, _ in idx])              # (G, nz, fH, NBP)
            j_star = jnp.stack([
                jnp.pad(j, ((0, 0), (0, pad_b), (0, 0)),
                        constant_values=-1) for _, j, _ in idx])
            kd_star = jnp.stack([
                jnp.pad(k, ((0, 0), (0, pad_b), (0, 0)),
                        constant_values=-1) for _, _, k in idx])
            # Static per-camera slices (constant fancy indexing lowers
            # to a real gather on this backend — pathologically slow).
            out = _group_forward(
                jnp.stack([fp[c] for c in cams]),
                i_star, j_star, kd_star, cf)
            out = out[:, :wd, :, :c_ch]           # (nz, wd, n_g, C)
            if not sx:
                out = out.transpose(0, 2, 1, 3)   # (nz, n_g, wd, C)
            axis = 1 if sx else 2
            pads = [(0, 0)] * 4
            pads[axis] = (off, acc.shape[axis] - off - out.shape[axis])
            acc = acc + jnp.pad(out.astype(jnp.float32), pads)
        return acc

    if einsum_ref is None:
        return forward(depth, feat, minv, mt)

    @jax.custom_vjp
    def f(d, ft, mv, mtt):
        return forward(d, ft, mv, mtt)

    def f_fwd(d, ft, mv, mtt):
        return forward(d, ft, mv, mtt), (d, ft, mv, mtt)

    def f_bwd(res, g):
        d, ft, mv, mtt = res
        gd, gf = jax.vjp(
            lambda dd, ff: einsum_ref(dd, ff, mv, mtt), d, ft)[1](g)
        # Geometry gradients are identically zero: (minv, mt) reach the
        # output only through round()-ed integer index fields.
        return gd, gf, jnp.zeros_like(mv), jnp.zeros_like(mtt)

    f.defvjp(f_fwd, f_bwd)
    return f(depth, feat, minv, mt)
