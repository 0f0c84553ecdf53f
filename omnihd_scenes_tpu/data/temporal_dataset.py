"""Temporal (frame-queue) dataset for BEVFormer.

Parity target: ``CustomNewScenesDataset``
(reference ``datasets/custom_newscenes_dataset.py:27-200``):
- can_bus finalized per frame: [:3] = ego translation, [3:7] = rotation
  quaternion, [-2] = patch yaw (rad), [-1] = patch yaw (deg)
  (``:172-184``);
- training queues sample ``queue_length`` frames: random-drop-one of
  the 4 predecessors, then sorted + current (``:45-48``);
- ``union2one`` rewrites can_bus to per-frame deltas (position and
  patch-angle) with ``prev_bev_exists`` scene-boundary flags
  (``:63-91``).

Test mode yields single frames with ABSOLUTE can_bus plus scene tokens;
the streaming eval runner maintains (prev_bev, prev_pos, prev_angle)
host state and computes deltas, mirroring ``bevformer.py:270-306``.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from omnihd_scenes_tpu.data.dataset import NewScenesDetDataset
from omnihd_scenes_tpu.utils.quaternion import Quaternion


def finalize_can_bus(info: Dict) -> np.ndarray:
    """Absolute can_bus with patch-angle fields (reference get_data_info)."""
    can_bus = np.array(info['can_bus'], np.float64).copy()
    rotation = Quaternion(np.asarray(info['ego2global_rotation']))
    can_bus[:3] = np.asarray(info['ego2global_translation'])
    can_bus[3:7] = rotation.elements
    v = rotation.rotation_matrix @ np.array([1.0, 0.0, 0.0])
    patch_angle = np.arctan2(v[1], v[0]) / np.pi * 180.0
    if patch_angle < 0:
        patch_angle += 360.0
    can_bus[-2] = patch_angle / 180.0 * np.pi
    can_bus[-1] = patch_angle
    return can_bus.astype(np.float32)


class TemporalNewScenesDataset(NewScenesDetDataset):
    """Frame-queue camera dataset."""

    def __init__(self, *args, queue_length: int = 3, **kwargs):
        kwargs.setdefault('use_camera', True)
        kwargs.setdefault('modality', 'camera')
        super().__init__(*args, **kwargs)
        self.queue_length = queue_length

    def _queue_indices(self, index: int) -> List[int]:
        cands = list(range(index - self.queue_length, index))
        self.rng.shuffle(cands)
        cands = sorted(cands[1:])
        cands.append(index)
        return [max(0, i) for i in cands]

    def _frame(self, idx: int) -> Dict[str, np.ndarray]:
        info = self.infos[idx]
        cam = self._load_camera(info)
        return {
            'imgs': cam['imgs'],
            'lidar2img': cam['lidar2img'],
            'can_bus': finalize_can_bus(info),
            'scene_token': info['scene_token'],
        }

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        info = self.infos[idx]
        if self.test_mode:
            frame = self._frame(idx)
            return {
                'imgs': frame['imgs'],
                'lidar2img': frame['lidar2img'],
                'can_bus': frame['can_bus'],
                'index': np.int32(idx),
            }

        frames = [self._frame(i) for i in self._queue_indices(idx)]

        # union2one: relative can_bus + scene-boundary flags.
        prev_scene = None
        prev_pos = prev_angle = None
        has_prev = []
        for f in frames:
            cb = f['can_bus']
            if f['scene_token'] != prev_scene:
                has_prev.append(False)
                prev_scene = f['scene_token']
                prev_pos = cb[:3].copy()
                prev_angle = float(cb[-1])
                cb[:3] = 0.0
                cb[-1] = 0.0
            else:
                has_prev.append(True)
                tmp_pos = cb[:3].copy()
                tmp_angle = float(cb[-1])
                cb[:3] -= prev_pos
                cb[-1] -= prev_angle
                prev_pos = tmp_pos
                prev_angle = tmp_angle

        boxes, labels, mask = self._load_annotations(info)
        return {
            'imgs': np.stack([f['imgs'] for f in frames]),
            'lidar2img': np.stack([f['lidar2img'] for f in frames]),
            'can_bus': np.stack([f['can_bus'] for f in frames]),
            'has_prev': np.asarray(has_prev),
            'gt_boxes': boxes,
            'gt_labels': labels,
            'gt_mask': mask,
            'index': np.int32(idx),
        }


class StreamingEvalState:
    """Host-side prev_frame_info for streaming eval
    (reference ``bevformer.py:60-65, 270-306``)."""

    def __init__(self, bev_shape):
        self.prev_bev = np.zeros(bev_shape, np.float32)
        self.has_prev = False
        self.prev_scene = None
        self.prev_pos = np.zeros(3)
        self.prev_angle = 0.0

    def prepare(self, can_bus_abs: np.ndarray, scene_token: str):
        """Relative can_bus for the incoming frame + has_prev flag."""
        cb = can_bus_abs.copy()
        if scene_token != self.prev_scene:
            self.has_prev = False
        tmp_pos = cb[:3].copy()
        tmp_angle = float(cb[-1])
        if self.has_prev:
            cb[:3] -= self.prev_pos
            cb[-1] -= self.prev_angle
        else:
            cb[:3] = 0.0
            cb[-1] = 0.0
        self.prev_scene = scene_token
        self.prev_pos = tmp_pos
        self.prev_angle = tmp_angle
        return cb, self.has_prev

    def update(self, new_bev: np.ndarray):
        self.prev_bev = np.asarray(new_bev)
        self.has_prev = True
