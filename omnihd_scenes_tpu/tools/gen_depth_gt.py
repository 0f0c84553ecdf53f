"""Depth ground-truth generation from lidar.

Parity target: ``tools/gen_depth_gt_newscenes.py:13-147`` — per sample
and camera: undistort-aware projection of the lidar cloud into the
image, writing sparse ``[u, v, d]`` float32 bins under a ``depth_gt``
directory mirroring the camera tree.  Thread-pooled (the reference used
``multiprocessing.Pool(12)``).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import pickle
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from omnihd_scenes_tpu.data.lidar_loading import load_lidar_points
from omnihd_scenes_tpu.data.image_loading import build_lidar2img


def depth_points_for_cam(points_xyz: np.ndarray, lidar2img: np.ndarray,
                         img_hw) -> np.ndarray:
    """Project lidar xyz into one camera -> (N, 3) [u, v, depth]."""
    homo = np.concatenate(
        [points_xyz, np.ones((len(points_xyz), 1))], axis=1)
    cam = homo @ lidar2img.T
    keep = cam[:, 2] > 0.5
    cam = cam[keep]
    uv = cam[:, :2] / cam[:, 2:3]
    d = cam[:, 2]
    ok = ((uv[:, 0] >= 0) & (uv[:, 0] < img_hw[1])
          & (uv[:, 1] >= 0) & (uv[:, 1] < img_hw[0]))
    return np.concatenate([uv[ok], d[ok, None]],
                          axis=1).astype(np.float32)


def process_info(info, img_hw=(1080, 1920)) -> int:
    pts = load_lidar_points(info['lidar_path'])[:, :3]
    written = 0
    for cam_type, cam_info in info['cams'].items():
        lidar2img, _, _ = build_lidar2img(cam_info)
        uvd = depth_points_for_cam(pts, lidar2img, img_hw)
        out_path = cam_info['data_path'].replace('cameras', 'depth_gt') \
            + '.bin'
        # OmniHD layout keeps cameras under per-sensor dirs; mirror it.
        if '/depth_gt/' not in out_path:
            d, base = osp.split(cam_info['data_path'])
            root, sensor = osp.split(d)
            out_path = osp.join(root, 'depth_gt', sensor, base + '.bin')
        os.makedirs(osp.dirname(out_path), exist_ok=True)
        uvd.tofile(out_path)
        written += 1
    return written


def main():
    p = argparse.ArgumentParser(description='Generate lidar depth GT')
    p.add_argument('info_pkl')
    p.add_argument('--workers', type=int, default=4)
    p.add_argument('--img-h', type=int, default=1080)
    p.add_argument('--img-w', type=int, default=1920)
    args = p.parse_args()

    with open(args.info_pkl, 'rb') as f:
        infos = pickle.load(f)['infos']
    hw = (args.img_h, args.img_w)
    with ThreadPoolExecutor(max_workers=args.workers) as ex:
        total = sum(ex.map(lambda i: process_info(i, hw), infos))
    print(f'wrote {total} depth maps for {len(infos)} samples')


if __name__ == '__main__':
    main()
