"""Lift-Splat-Shoot camera view transform (flax, TPU-native splat).

Parity target: ``LiftSplatShoot`` with bev_pool_v2
(reference ``bevfusion/detectors/cam_stream_lss_bevpoolv2.py:18-376``):
- frustum of (D, fH, fW) image-plane points (``create_frustum``);
- ``CamEncode``: one 1x1 conv -> D softmax depth bins + C features;
- geometry: (u*d, v*d, d) through the img->lidar rotation/translation
  (``get_geometry``);
- splat into a (Z, Y, X, C) grid — the CUDA rank/interval machinery
  becomes a chunked scatter-add (:mod:`omnihd_scenes_tpu.ops.bev_pool`);
- z-collapse concat + conv BEV encoder (``s2c`` + ``bevencode``).

Also includes the BEVDepth-style ``DepthNet`` variant
(``cam_stream_lss_bevpoolv2_depthnet.py:537-582``) used by the
``BEVFUSION_depth`` config, with depth supervision losses (BCE one-hot /
Gaussian KLD) in :mod:`omnihd_scenes_tpu.models.depth_loss`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from omnihd_scenes_tpu.models.layers import ConvBNReLU
from omnihd_scenes_tpu.models.quant import Conv as QConv
from omnihd_scenes_tpu.ops.bev_pool import frustum_voxel_ids, lss_splat
from omnihd_scenes_tpu.ops.lss_project import lss_sample_bev


@dataclass(frozen=True)
class LSSConfig:
    final_dim: Tuple[int, int] = (544, 960)    # padded input image H, W
    downsample: int = 4                         # feature stride
    camera_depth_range: Tuple[float, float, float] = (1.0, 60.0, 1.0)
    pc_range: Tuple[float, ...] = (-60, -40, -3.0, 60, 40, 5.0)
    grid: float = 0.5
    num_views: int = 6
    inputC: int = 256                           # image feature channels
    camC: int = 64                              # lifted feature channels
    outC: int = 256                             # BEV output channels
    # View-transform implementation:
    #   'sample'  — gather-dual one-hot-matmul transform (MXU, ~20x
    #               faster on TPU; Simple-BEV-style sampling semantics);
    #   'scatter' — exact splat-sum parity with the reference CUDA
    #               bev_pool_v2 (XLA scatter-add; slow on TPU).
    splat_mode: str = 'sample'
    # Kernel backend for splat_mode='sample': 'auto' (pallas on TPU,
    # einsum elsewhere), 'einsum', or 'pallas'.
    splat_impl: str = 'auto'
    # Multi-chip: pallas_call does not compose with GSPMD automatic
    # partitioning, so under a sharded (pjit) graph the splat region
    # must be explicitly per-shard.  Set this to the mesh's data axis
    # name (e.g. 'data') to wrap the per-sample splat loop in
    # jax.shard_map over that axis (batch is embarrassingly parallel —
    # each sample's splat touches only its own cameras), registered via
    # parallel.mesh.set_current_mesh(mesh).  None (default) = no wrap
    # (single-chip, or einsum under GSPMD which partitions natively).
    splat_shard_axis: Optional[str] = None
    # Per-camera-slot flag for the sampling transform: True for cameras
    # viewing mostly along BEV x.  Default matches the OmniHD rig order
    # (front, left_front, right_front, back, left_back, right_back at
    # yaws 0/55/-55/180/125/-125 deg — devkit converter CAMERA_TYPES).
    cam_solve_x: Tuple[bool, ...] = (True, False, False, True, False, False)
    # Optional per-camera static FOV windows on the sampling transform's
    # b axis (y-columns for solve_x cameras, x-columns otherwise), as
    # (offset, width) in BEV cells.  Conservative windows change no
    # outputs (out-of-FOV cells contribute nothing) but cut the
    # transform's work proportionally.  None = full extent.
    cam_b_windows: Tuple[Tuple[int, int], ...] = None
    # Selective rematerialization of LSS sub-trunks ('depthnet',
    # 'bevencode').  Used with BEVFusionConfig(remat_exclude=('lss',)):
    # instead of rematting the whole LiftSplatShoot (which recomputes
    # DepthNet + splat + BevEncode, ~27 ms/sample, in the backward),
    # only the named parts recompute and the rest keep activations.
    # Param names are pinned, so checkpoints are unchanged either way.
    remat_parts: Tuple[str, ...] = ()

    _PARTS = ('depthnet', 'bevencode')

    def __post_init__(self):
        # remat is numerically invisible: an unknown part name would
        # silently no-op (see BEVFusionConfig.remat_exclude).
        bad = set(self.remat_parts) - set(self._PARTS)
        if bad:
            raise ValueError(
                f'remat_parts {sorted(bad)} not in {self._PARTS}')

    @property
    def feat_hw(self) -> Tuple[int, int]:
        return (self.final_dim[0] // self.downsample,
                self.final_dim[1] // self.downsample)

    @property
    def depth_bins(self) -> int:
        d0, d1, dd = self.camera_depth_range
        return int((d1 - d0) / dd)

    @property
    def bev_nx(self) -> Tuple[int, int, int]:
        """(nx, ny, nz) voxel counts."""
        return (int((self.pc_range[3] - self.pc_range[0]) / self.grid),
                int((self.pc_range[4] - self.pc_range[1]) / self.grid),
                int((self.pc_range[5] - self.pc_range[2]) / self.grid))

    def frustum(self) -> np.ndarray:
        """(D, fH, fW, 3) image-plane (u, v, depth) sample points."""
        ogf_h, ogf_w = self.final_dim
        f_h, f_w = self.feat_hw
        d0, d1, dd = self.camera_depth_range
        ds = np.arange(d0, d1, dd, dtype=np.float32)
        xs = np.linspace(0, ogf_w - 1, f_w, dtype=np.float32)
        ys = np.linspace(0, ogf_h - 1, f_h, dtype=np.float32)
        grid = np.zeros((len(ds), f_h, f_w, 3), np.float32)
        grid[..., 0] = xs[None, None, :]
        grid[..., 1] = ys[None, :, None]
        grid[..., 2] = ds[:, None, None]
        return grid


class CamEncode(nn.Module):
    """1x1 conv -> (D softmax depth, C context features)."""

    depth_bins: int
    cam_channels: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.depth_bins + self.cam_channels, (1, 1))(x)
        depth = jax.nn.softmax(x[..., :self.depth_bins], axis=-1)
        feat = x[..., self.depth_bins:]
        return feat, depth


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (reference ``ASPP``,
    ``cam_stream_lss_bevpoolv2_depthnet.py:490-557``): 1x1 + three
    dilated 3x3 branches (dilations 6/12/18) + global-average branch,
    concatenated and reduced 1x1."""

    mid_channels: int = 256

    @nn.compact
    def __call__(self, x, train: bool = True):
        def branch(k, dilation):
            pad = 0 if k == 1 else dilation
            y = QConv(self.mid_channels, (k, k),
                      kernel_dilation=(dilation, dilation),
                      padding=[(pad, pad)] * 2, use_bias=False)(x)
            y = nn.BatchNorm(use_running_average=not train)(y)
            return nn.relu(y)

        b1 = branch(1, 1)
        b2 = branch(3, 6)
        b3 = branch(3, 12)
        b4 = branch(3, 18)
        g = jnp.mean(x, axis=(-3, -2), keepdims=True)
        g = QConv(self.mid_channels, (1, 1), use_bias=False)(g)
        g = nn.BatchNorm(use_running_average=not train)(g)
        g = nn.relu(g)
        g = jnp.broadcast_to(g, b4.shape[:-1] + (self.mid_channels,))
        y = jnp.concatenate([b1, b2, b3, b4, g], axis=-1)
        y = QConv(self.mid_channels, (1, 1), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        return nn.relu(y)


class DepthNet(nn.Module):
    """BEVDepth-style depth head (reference ``DepthNet``,
    ``cam_stream_lss_bevpoolv2_depthnet.py:563-608``): reduce conv ->
    context 1x1 branch, and a depth branch of three BasicBlock
    residual units + ASPP + deformable conv + 1x1 logits.  (The
    reference's DCNv1 groups=4 becomes a single-group DCNv2; its ASPP
    dropout is omitted — no rng plumbing in the eval-heavy paths.)"""

    depth_bins: int
    cam_channels: int
    mid_channels: Optional[int] = None  # reference: = in_channels
    use_aspp: bool = True
    # DCN sampling is gather-bound on this TPU backend; off by default
    # (capacity deviation from the reference noted in PARITY.md).
    use_dcn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        from omnihd_scenes_tpu.models.dcn import DeformConv
        from omnihd_scenes_tpu.models.resnet import BasicBlock

        mid = self.mid_channels or x.shape[-1]
        x = ConvBNReLU(mid, (3, 3))(x, train)
        ctx = nn.Conv(self.cam_channels, (1, 1))(x)

        # Blocks run per-view on (B*N, h, w, C) maps.
        lead = x.shape[:-3]
        d = x.reshape((-1,) + x.shape[-3:])
        for _ in range(3):
            d = BasicBlock(mid, use_running_average=not train)(d)
        if self.use_aspp:
            d = ASPP(mid)(d, train)
        if self.use_dcn:
            d = DeformConv(mid, 3)(d)
        depth_logits = nn.Conv(self.depth_bins, (1, 1))(d)
        depth_logits = depth_logits.reshape(
            lead + depth_logits.shape[-3:])
        depth = jax.nn.softmax(depth_logits, axis=-1)
        return ctx, depth, depth_logits


class BevEncoderConvs(nn.Module):
    """Z-collapsed BEV conv stack (reference ``bevencode`` Sequential:
    cz -> cz -> 512 -> 512 -> inputC, all 3x3 Conv-BN-ReLU)."""

    outC: int = 256

    @nn.compact
    def __call__(self, x, train: bool = True):
        cz = x.shape[-1]
        x = ConvBNReLU(cz, (3, 3))(x, train)
        x = ConvBNReLU(512, (3, 3))(x, train)
        x = ConvBNReLU(512, (3, 3))(x, train)
        x = ConvBNReLU(self.outC, (3, 3))(x, train)
        return x


class LiftSplatShoot(nn.Module):
    """Camera features + geometry -> BEV feature map.

    Input: per-sample camera features (N, fH, fW, inputC) and img->lidar
    rots/trans (N, 3, 3)/(N, 3).  Output: (ny, nx, outC) BEV features
    (y-major like the pillar canvas) + depth distributions.
    """

    cfg: LSSConfig = LSSConfig()
    use_depthnet: bool = False

    @nn.compact
    def __call__(self, cam_feats, rots, trans, train: bool = True):
        cfg = self.cfg
        nx, ny, nz = cfg.bev_nx
        frustum = jnp.asarray(cfg.frustum())

        def part(name, cls, train_argnum):
            # `train` is a Python bool -> static under nn.remat.
            return (nn.remat(cls, static_argnums=(train_argnum,))
                    if name in cfg.remat_parts else cls)

        if self.use_depthnet:
            feat, depth, depth_logits = part('depthnet', DepthNet, 2)(
                cfg.depth_bins, cfg.camC, name='DepthNet_0')(cam_feats,
                                                             train)
        else:
            feat, depth = CamEncode(cfg.depth_bins, cfg.camC)(cam_feats)
            depth_logits = None
        # feat: (B, N, fH, fW, camC); depth: (B, N, fH, fW, D)

        n_view = cam_feats.shape[1]
        solve_x = (cfg.cam_solve_x + (True,) * n_view)[:n_view]

        def splat_one(feat_b, depth_b, rots_b, trans_b):
            if cfg.splat_mode == 'sample':
                return lss_sample_bev(
                    depth_b, feat_b, rots_b, trans_b,
                    image_size=cfg.final_dim,
                    depth_range=cfg.camera_depth_range,
                    bev_start=(cfg.pc_range[0], cfg.pc_range[1],
                               cfg.pc_range[2]),
                    bev_voxel=(cfg.grid,) * 3,
                    bev_nx=(nx, ny, nz),
                    solve_x=solve_x,
                    b_windows=(None if cfg.cam_b_windows is None
                               else tuple(cfg.cam_b_windows)),
                    impl=cfg.splat_impl)
            ids = frustum_voxel_ids(
                frustum, rots_b, trans_b,
                bev_start=(cfg.pc_range[0], cfg.pc_range[1], cfg.pc_range[2]),
                bev_voxel=(cfg.grid,) * 3,
                bev_nx=(nx, ny, nz))                   # (N, D, fH, fW)
            depth_nd = jnp.moveaxis(depth_b, -1, 1)     # (N, D, fH, fW)
            pooled = lss_splat(depth_nd, feat_b, ids, nz * ny * nx)
            return pooled.reshape(nz, ny, nx, cfg.camC)

        # Static per-sample loop instead of vmap: batch sizes here are
        # small (1-4), and vmap-of-pallas_call breaks this backend's
        # AOT compiler (HTTP 500 from the compile helper).
        def splat_batch(feat_b, depth_b, rots_b, trans_b):
            return jnp.stack([
                splat_one(feat_b[b], depth_b[b], rots_b[b], trans_b[b])
                for b in range(feat_b.shape[0])])

        if cfg.splat_shard_axis is not None:
            # Multi-chip: run the (param-free) splat region explicitly
            # per data shard so pallas_call never meets the GSPMD
            # partitioner.  Inside shard_map the leading dim is the
            # per-shard batch, so the same static loop applies.
            from jax.sharding import PartitionSpec as _P

            from omnihd_scenes_tpu.parallel.mesh import current_mesh
            ax = cfg.splat_shard_axis
            # check_vma=False: the region is collective-free (pure
            # per-shard compute) and pallas_call's out_shape carries no
            # varying-mesh-axes annotation for the checker.
            vox = jax.shard_map(
                splat_batch, mesh=current_mesh(),
                in_specs=(_P(ax), _P(ax), _P(ax), _P(ax)),
                out_specs=_P(ax), check_vma=False)(feat, depth, rots,
                                                   trans)
        else:
            vox = splat_batch(feat, depth, rots, trans)
        # Collapse Z into channels: (B, ny, nx, nz * camC).
        b = vox.shape[0]
        bev = jnp.moveaxis(vox, 1, -2).reshape(b, ny, nx, nz * cfg.camC)
        bev = part('bevencode', BevEncoderConvs, 2)(
            cfg.outC, name='BevEncoderConvs_0')(bev, train)
        return bev, depth, depth_logits
