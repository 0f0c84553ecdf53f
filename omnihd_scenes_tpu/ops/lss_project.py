"""Gather-dual LSS view transform as dense one-hot matmuls (TPU-native).

The reference LSS splat (``bev_pool_v2``,
``cam_stream_lss_bevpoolv2.py:229-351`` + CUDA kernel
``ops/bev_pool_v2/src/bev_pool_cuda.cu:21-48``) scatter-adds ~12.5M
depth-weighted frustum points into the BEV grid.  On TPU any XLA
scatter formulation is per-row bound (~17 ns/row => ~200 ms/sample,
BENCH.md) — two orders of magnitude off the MXU's capability.

This module implements the *sampling dual* (Simple-BEV-style): for each
BEV voxel center, back-project into each camera and read the
depth-weighted feature there:

    out[z, y, x, c] = sum_n  depth_n(d*, v*, u*) * feat_n(v*, u*, c)

with (u*, v*, d*) the projection of the voxel center into camera n
(nearest-neighbor bins).  Semantics differ from splat-sum only in
multiplicity (a voxel samples one frustum point instead of summing all
points that land in it); per Simple-BEV (arXiv:2206.07959) this is
accuracy-neutral for BEV perception and here it is ~20x faster.

The TPU trick: there is no gather at all.  The map voxel->pixel is
projective, so it is evaluated in closed form on a separable
intermediate grid and applied as TWO dense one-hot contractions that
run on the MXU:

  pass 1 (contract image width):  for intermediate grid (image row j,
      BEV column b), solve the BEV coordinate along the camera viewing
      axis whose projection hits image row v_j, compute the continuous
      image column u*(j, b) there, and contract the feat/depth channels
      against the one-hot ``(round(u*) == i)``.
  pass 2 (contract image rows):   for each output cell (g, b), compute
      the continuous image row v*(g, b) and contract against
      ``(round(v*) == j)``.
  depth select: the depth channels were carried through both passes;
      select bin ``round((d* - d0)/dd)`` with a per-cell one-hot over
      the D channels.

One-hot operands are built in-graph from iota comparisons — no host
tables, no gathers, fully differentiable w.r.t. ``feat`` and ``depth``.

Two interchangeable implementations (verified identical in tests):
  * ``impl='einsum'`` — pure XLA einsums (runs anywhere, used for the
    backward pass);
  * ``impl='pallas'`` — fused TPU kernels
    (:mod:`omnihd_scenes_tpu.ops.pallas_splat`) that build the one-hots
    in VMEM, avoiding the O(fW) / O(fH) one-hot HBM round-trips that
    dominate the einsum lowering (29 ms -> ~5 ms at production scale).

Per camera the well-conditioned parametrization depends on the viewing
direction: cameras looking along BEV x (front/back) solve for x and
parametrize columns by y; side cameras the reverse.  The choice is a
static per-camera-slot config (`solve_x`), matching the fixed rig.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 1e9


def _safe_div(a, b, eps=1e-6):
    bs = jnp.where(jnp.abs(b) < eps, jnp.where(b < 0, -eps, eps), b)
    return a / bs


def _clean_idx(x, valid):
    """Round a float index to int32, routing invalid/non-finite lanes to
    -1 (which never matches a one-hot compare)."""
    ok = valid & jnp.isfinite(x)
    x = jnp.where(ok, x, -_BIG)
    return jnp.clip(jnp.round(x), -1, _BIG).astype(jnp.int32)


class _Geom:
    """Static geometry bundle shared by both implementations.

    Holds plain NumPy arrays on purpose: a ``jnp`` constant created
    while tracing a ``jax.checkpoint``-ed function becomes a
    trace-local constvar, and reusing it from the backward re-trace
    (via the ``einsum_ref`` closure) raises UnexpectedTracerError.
    NumPy constants convert freshly at every use-site instead.
    """

    def __init__(self, image_size, feat_hw, depth_range, bev_start,
                 bev_voxel, bev_nx):
        self.h_img, self.w_img = image_size
        self.f_h, self.f_w = feat_hw
        self.d0, self.d1, self.dd = depth_range
        self.nx, self.ny, self.nz = (int(v) for v in bev_nx)
        self.v_scale = (self.f_h - 1) / max(self.h_img - 1, 1)
        self.u_scale = (self.f_w - 1) / max(self.w_img - 1, 1)
        self.ys = np.linspace(0, self.h_img - 1, self.f_h,
                              dtype=np.float32)
        self.xc = np.asarray(
            bev_start[0]
            + (np.arange(self.nx, dtype=np.float32) + 0.5) * bev_voxel[0],
            np.float32)
        self.yc = np.asarray(
            bev_start[1]
            + (np.arange(self.ny, dtype=np.float32) + 0.5) * bev_voxel[1],
            np.float32)
        self.zc = np.asarray(
            bev_start[2]
            + (np.arange(self.nz, dtype=np.float32) + 0.5) * bev_voxel[2],
            np.float32)


def _sample_indices(minv_n, mt_n, solve_axis_x: bool, g: _Geom,
                    b_window=None):
    """Per-camera index fields for the two passes.

    Args:
        b_window: optional static (offset, width) restricting the BEV
            b-axis to the camera's field of view — the index fields
            (and downstream contractions) then cover only those
            columns.  Cells outside a camera's FOV already contribute
            nothing (their one-hot rows are all-zero), so a
            conservative window changes no output values, only work.

    Returns:
        i_star: (fH, nz, n_b) int32 — pass-1 image-column index.
        j_star: (nz, n_b, n_g) int32 — pass-2 image-row index.
        kd_star: (nz, n_b, n_g) int32 — depth-bin index.
    n_b/n_g are (ny, nx) when solve_axis_x else (nx, ny); with a
    window, n_b is its width.
    """
    if solve_axis_x:
        a_col = minv_n[:, 0]                       # coeff of solved X
        bc, gc = g.yc, g.xc
        fixed = minv_n[:, 1]                       # coeff of column Y
    else:
        a_col = minv_n[:, 1]
        bc, gc = g.xc, g.yc
        fixed = minv_n[:, 0]
    if b_window is not None:
        off, wd = b_window
        bc = bc[off:off + wd]          # static host-side slice (bc is np)
    # c[a, k, b] = fixed_a * bc_b + Minv[a,2] * zc_k + mt_a
    cc = (fixed[:, None, None] * bc[None, None, :]
          + minv_n[:, 2][:, None, None] * g.zc[None, :, None]
          + mt_n[:, None, None])                  # (3, nz, n_b)
    d_floor = max(1e-3, g.d0 * 0.5)

    # ---- pass 1: solve q1/q2 = v_j for the free coordinate s ----
    v = g.ys[:, None, None]                        # (fH, 1, 1)
    denom = a_col[1] - v * a_col[2]
    s_star = _safe_div(v * cc[2][None] - cc[1][None], denom)
    q2s = a_col[2] * s_star + cc[2][None]          # depth at (j, k, b)
    us = _safe_div(a_col[0] * s_star + cc[0][None], q2s)
    ok1 = (q2s > d_floor) & (us > -0.5) & (us < g.w_img - 0.5)
    i_star = _clean_idx(us * g.u_scale, ok1)       # (fH, nz, n_b)

    # ---- pass 2: full projection at output cell (k, b, g) ----
    qf = (a_col[:, None, None, None] * gc[None, None, None, :]
          + cc[:, :, :, None])                     # (3, nz, n_b, n_g)
    d_star = qf[2]
    vs = _safe_div(qf[1], d_star)
    ok2 = (d_star > d_floor) & (vs > -0.5) & (vs < g.h_img - 0.5)
    j_star = _clean_idx(vs * g.v_scale, ok2)       # (nz, n_b, n_g)
    kd_star = _clean_idx((d_star - g.d0) / g.dd, ok2)
    return i_star, j_star, kd_star


def _variant_einsum(fp_n, i_star, j_star, kd_star, c_ch, d_bins,
                    compute_dtype):
    """One camera via XLA einsums.  fp_n: (fH, fW, C+D)."""
    f_h, f_w = fp_n.shape[:2]
    iota_i = jnp.arange(f_w, dtype=jnp.int32)
    iota_j = jnp.arange(f_h, dtype=jnp.int32)
    iota_d = jnp.arange(d_bins, dtype=jnp.int32)

    onehot1 = (i_star[..., None] == iota_i).astype(compute_dtype)
    # (fH, nz, n_b, fW) x (fH, fW, M) -> (nz, fH, n_b, M)
    inter = jnp.einsum('jkbi,jim->kjbm', onehot1, fp_n,
                       preferred_element_type=jnp.float32)
    inter = inter.astype(compute_dtype)

    onehot2 = (j_star[..., None] == iota_j).astype(compute_dtype)
    # (nz, fH, n_b, M) x (nz, n_b, n_g, fH) -> (nz, n_b, n_g, M)
    out_plus = jnp.einsum('kjbm,kbgj->kbgm', inter, onehot2,
                          preferred_element_type=jnp.float32)

    onehot_d = (kd_star[..., None] == iota_d).astype(out_plus.dtype)
    w = jnp.sum(out_plus[..., c_ch:] * onehot_d, axis=-1)
    return out_plus[..., :c_ch] * w[..., None]     # (nz, n_b, n_g, C)


def compute_b_windows(rots, trans, *, image_size, feat_hw, depth_range,
                      bev_start, bev_voxel, bev_nx,
                      solve_x: Sequence[bool], margin: int = 2,
                      align: int = 8):
    """Derive static per-camera FOV windows from the calibration.

    Runs the index computation once (host side, at model-build time —
    calibration is static for a deployed rig) and returns, per camera,
    the (offset, width) range of b columns with any valid sample,
    widened by ``margin`` cells and aligned to ``align``.  Feed the
    result to ``lss_sample_bev(b_windows=...)``; it is conservative by
    construction *for the (rots, trans) it was derived from*.

    INFERENCE-ONLY for a fixed rig: the windows are static, but
    ``lss_sample_bev`` applies them to whatever per-sample extrinsics
    arrive at runtime.  Extrinsics perturbed away from the nominal
    calibration (training-time GlobalRotScaleTransImage augmentation,
    rig drift) can move valid samples outside the window and silently
    zero BEV columns — do NOT pass ``b_windows`` in training graphs,
    and re-derive windows whenever the deployed calibration changes.
    Use ``check_b_windows`` (debug, host-side) to verify a window set
    against the actual runtime extrinsics.
    """
    geom = _Geom(image_size, feat_hw, depth_range, bev_start, bev_voxel,
                 bev_nx)
    rots = np.asarray(rots, np.float64)
    trans = np.asarray(trans, np.float64)
    minv = np.linalg.inv(rots)
    mt = -np.einsum('nij,nj->ni', minv, trans)
    windows = []
    for n, sx in enumerate(solve_x):
        i_star, j_star, _ = jax.tree.map(
            np.asarray,
            _sample_indices(jnp.asarray(minv[n], jnp.float32),
                            jnp.asarray(mt[n], jnp.float32), sx, geom))
        n_b = i_star.shape[-1]
        valid = ((i_star >= 0).any(axis=(0, 1))
                 | (j_star >= 0).any(axis=(0, 2)))
        if not valid.any():
            windows.append((0, min(align, n_b)))
            continue
        lo = max(0, int(np.argmax(valid)) - margin)
        hi = min(n_b, n_b - int(np.argmax(valid[::-1])) + margin)
        lo = lo // align * align
        wd = min(n_b - lo, -(-(hi - lo) // align) * align)
        windows.append((lo, wd))
    return tuple(windows)


def check_b_windows(b_windows, rots, trans, *, image_size, feat_hw,
                    depth_range, bev_start, bev_voxel, bev_nx,
                    solve_x: Sequence[bool]) -> bool:
    """Debug check: do ``b_windows`` cover every valid sample for the
    given (possibly runtime-perturbed) extrinsics?

    Host-side; returns True when no valid (i_star, j_star) column falls
    outside its camera's window.  Run this when extrinsics may differ
    from the calibration the windows were derived from (see
    ``compute_b_windows`` docstring).
    """
    fresh = compute_b_windows(rots, trans, image_size=image_size,
                              feat_hw=feat_hw, depth_range=depth_range,
                              bev_start=bev_start, bev_voxel=bev_voxel,
                              bev_nx=bev_nx, solve_x=solve_x, margin=0,
                              align=1)
    for (lo, wd), (flo, fwd) in zip(b_windows, fresh):
        if flo < lo or flo + fwd > lo + wd:
            return False
    return True


def lss_sample_bev(depth: jnp.ndarray,
                   feat: jnp.ndarray,
                   rots: jnp.ndarray,
                   trans: jnp.ndarray,
                   *,
                   image_size: Tuple[int, int],
                   depth_range: Tuple[float, float, float],
                   bev_start: Sequence[float],
                   bev_voxel: Sequence[float],
                   bev_nx: Sequence[int],
                   solve_x: Sequence[bool],
                   b_windows=None,
                   compute_dtype=None,
                   impl: str = 'auto') -> jnp.ndarray:
    """Sample camera features into the BEV grid (one sample).

    Args:
        depth: (N, fH, fW, D) softmax depth distributions.
        feat: (N, fH, fW, C) camera features.
        rots: (N, 3, 3) img->lidar rotations with the intrinsic inverse
            folded in (same convention as ``frustum_voxel_ids``):
            ``p_lidar = rots @ (u*d, v*d, d) + trans``.
        trans: (N, 3).
        image_size: (H, W) ORIGINAL image size the frustum pixel grid
            spans (``LSSConfig.final_dim``).
        depth_range: (d0, d1, dd); bins are ``arange(d0, d1, dd)``.
        bev_start: (x0, y0, z0) grid origin (min corner).
        bev_voxel: (dx, dy, dz).
        bev_nx: (nx, ny, nz).
        solve_x: per-camera flag — True for cameras viewing mostly along
            BEV x (front/back), False for side cameras.
        b_windows: optional per-camera static (offset, width) windows on
            the b axis (y for solve_x cameras, x for side cameras) —
            the camera's conservative FOV extent in BEV columns.  Cells
            outside a camera's FOV contribute nothing either way, so
            correct windows only cut work (~40% at production rig
            geometry where side cameras see ~60% of x columns).
        compute_dtype: matmul dtype for the one-hot contractions.
        impl: 'einsum', 'pallas', or 'auto' (pallas on TPU backends).

    Returns:
        (nz, ny, nx, C) BEV features (sum over cameras).
    """
    backend = jax.default_backend()
    if compute_dtype is None:
        # bf16 one-hot contractions are exact here (each one-hot row has
        # a single nonzero, so there is no accumulation error), but the
        # CPU backend lacks the BF16xBF16=F32 dot — keep f32 off-TPU.
        compute_dtype = jnp.float32 if backend == 'cpu' else jnp.bfloat16
    if impl == 'auto':
        # Measured at production scale (BENCH.md round 2): einsum
        # 12.8 ms, fused pallas kernels 10.2 ms after the layout rework
        # (intermediate written directly in kernel B's (cam,z,j,b,M)
        # layout; feat+depth packed into one lane dim).
        impl = 'einsum' if backend == 'cpu' else 'pallas'

    n_cams, f_h, f_w, d_bins = depth.shape
    c_ch = feat.shape[-1]
    geom = _Geom(image_size, (f_h, f_w), depth_range, bev_start,
                 bev_voxel, bev_nx)
    nz, ny, nx = geom.nz, geom.ny, geom.nx

    # q = Minv @ p + mt gives (u*d, v*d, d) for lidar point p.
    minv = jnp.linalg.inv(rots.astype(jnp.float32))
    mt = -jnp.einsum('nij,nj->ni', minv, trans.astype(jnp.float32))

    solve_x = tuple(bool(s) for s in solve_x)
    assert len(solve_x) == n_cams, (solve_x, n_cams)
    if b_windows is not None:
        b_windows = tuple((int(o), int(w)) for o, w in b_windows)
        assert len(b_windows) == n_cams, (b_windows, n_cams)
        for (off, wd), sx in zip(b_windows, solve_x):
            n_b = ny if sx else nx
            assert 0 <= off and off + wd <= n_b, (off, wd, n_b)

    if impl == 'pallas':
        from omnihd_scenes_tpu.ops.pallas_splat import sample_bev_pallas

        # The backward reference is parametrized by (minv, mt) EXPLICITLY
        # (not closed over): sample_bev_pallas threads them through its
        # custom_vjp residuals, so the whole op stays re-traceable under
        # jax.checkpoint / nn.remat (a closure over traced geometry
        # leaks the tracer when remat re-runs the forward).
        def einsum_ref(d, f, mv, mtt):
            # sequential=True: the backward (training) runs one camera
            # at a time so the per-camera cotangent temporaries never
            # coexist — this is what lets batch-4 training fit HBM.
            return _einsum_all(d, f, mv, mtt, geom, solve_x, b_windows,
                               compute_dtype, sequential=True)

        return sample_bev_pallas(depth, feat, minv, mt, geom, solve_x,
                                 b_windows=b_windows,
                                 einsum_ref=einsum_ref)

    return _einsum_all(depth, feat, minv, mt, geom, solve_x, b_windows,
                       compute_dtype)


def _einsum_all(depth, feat, minv, mt, geom, solve_x, b_windows,
                compute_dtype, sequential: bool = False):
    """Full einsum-impl forward given preprocessed geometry (minv, mt).

    ``sequential=True`` runs the cameras through ``lax.scan`` (grouped
    by the static ``solve_x`` branch) instead of the unrolled loop.
    Same function, but scan forces XLA to keep ONE camera's
    contraction temporaries live at a time — in the backward pass the
    unrolled loop materializes every camera's (nz, n_b, n_g, D)
    depth-select cotangent and (nz, n_b, n_g, fH) one-hot concurrently
    (~2.2 GB f32 at production batch 4, the RESOURCE_EXHAUSTED of
    BENCH.md round 3); the scan bounds it to one camera (~0.4 GB).
    Used by the pallas custom_vjp's backward reference (training);
    serving keeps the unrolled loop, which XLA overlaps better.
    """
    d_bins = depth.shape[-1]
    c_ch = feat.shape[-1]
    fp = jnp.concatenate([feat, depth], axis=-1).astype(compute_dtype)
    acc = jnp.zeros((geom.nz, geom.ny, geom.nx, c_ch), jnp.float32)

    if sequential and b_windows is None and len(solve_x) > 1:
        for sx in (True, False):
            cams = [n for n, s in enumerate(solve_x) if s == sx]
            if not cams:
                continue
            sel = np.asarray(cams)

            def body(carry, xs, sx=sx):
                fp_n, mv_n, mt_n = xs
                idx = _sample_indices(mv_n, mt_n, sx, geom, None)
                out = _variant_einsum(fp_n, *idx, c_ch, d_bins,
                                      compute_dtype)
                if not sx:                         # b=x, g=y
                    out = out.transpose(0, 2, 1, 3)
                return carry + out.astype(jnp.float32), None

            acc, _ = jax.lax.scan(body, acc,
                                  (fp[sel], minv[sel], mt[sel]))
        return acc

    # Static per-camera loop: solve_x branches have different shapes.
    for n, sx in enumerate(solve_x):
        win = None if b_windows is None else b_windows[n]
        idx = _sample_indices(minv[n], mt[n], sx, geom, win)
        out = _variant_einsum(fp[n], *idx, c_ch, d_bins, compute_dtype)
        off = 0 if win is None else win[0]
        if not sx:                                 # b=x, g=y
            out = out.transpose(0, 2, 1, 3)        # (nz, n_g, wd, C)
        # scatter-add the window back at its static offset
        axis = 1 if sx else 2
        pads = [(0, 0)] * 4
        pads[axis] = (off, acc.shape[axis] - off - out.shape[axis])
        acc = acc + jnp.pad(out.astype(jnp.float32), pads)
    return acc
