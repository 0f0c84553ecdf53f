"""TPU-native compute ops: voxelization, box geometry, NMS, BEV pooling,
deformable attention.  JAX/XLA formulations of the reference's CUDA ops."""

from omnihd_scenes_tpu.ops.boxes3d import (bbox_overlaps_nearest_3d,
                                           bev_corners, decode_boxes,
                                           encode_boxes, gravity_center,
                                           limit_period, nearest_bev,
                                           rotated_iou_bev)
from omnihd_scenes_tpu.ops.nms import multiclass_nms_rotated, nms_rotated
from omnihd_scenes_tpu.ops.voxelize import (VoxelizationOutput, scatter_to_bev,
                                            voxelize)

__all__ = ['bbox_overlaps_nearest_3d', 'bev_corners', 'decode_boxes',
           'encode_boxes', 'gravity_center', 'limit_period', 'nearest_bev',
           'rotated_iou_bev', 'multiclass_nms_rotated', 'nms_rotated',
           'VoxelizationOutput', 'scatter_to_bev', 'voxelize']
