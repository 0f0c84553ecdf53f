"""Aligned 3D anchor generation (host-side, precomputed once).

Parity target: mmdet3d ``AlignedAnchor3DRangeGenerator`` as configured in
``configs/PointPillars_NewScenes/pointpillars_4DRadar.py:61-78``: one
(z, size) pair per class over a shared xy range, rotations (0, pi/2),
2-dim velocity custom values.  Anchor layout is
(H, W, num_sizes * num_rots, 9) with sizes-major ordering — the head's
conv output reshape uses the same layout, so only self-consistency
matters.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def aligned_anchor_grid(feature_hw: Sequence[int],
                        ranges: List[Sequence[float]],
                        sizes: List[Sequence[float]],
                        rotations: Sequence[float] = (0.0, 1.5707963),
                        custom_values: Sequence[float] = (0.0, 0.0)) -> np.ndarray:
    """Build the dense anchor grid.

    Args:
        feature_hw: (H, W) of the head feature map; H indexes y, W x.
        ranges: per-size [x0, y0, z, x1, y1, z] anchor ranges.
        sizes: per-size [w, l, h].
        rotations: yaw set.
        custom_values: appended per anchor (velocities).

    Returns:
        (H, W, num_sizes * num_rots, 7 + len(custom_values)) float32.
    """
    h, w = feature_hw
    num_rot = len(rotations)
    per_size = []
    for rng, size in zip(ranges, sizes):
        x0, y0, z, x1, y1, _ = rng
        # Aligned: centers at half-stride offsets.
        sx = (x1 - x0) / w
        sy = (y1 - y0) / h
        xs = x0 + (np.arange(w) + 0.5) * sx
        ys = y0 + (np.arange(h) + 0.5) * sy
        gx, gy = np.meshgrid(xs, ys)                    # (H, W)
        base = np.zeros((h, w, num_rot, 7 + len(custom_values)),
                        dtype=np.float32)
        base[..., 0] = gx[..., None]
        base[..., 1] = gy[..., None]
        base[..., 2] = z
        base[..., 3] = size[0]
        base[..., 4] = size[1]
        base[..., 5] = size[2]
        base[..., 6] = np.asarray(rotations)
        for i, v in enumerate(custom_values):
            base[..., 7 + i] = v
        per_size.append(base)
    return np.stack(per_size, axis=2).reshape(
        h, w, len(sizes) * num_rot, 7 + len(custom_values))
