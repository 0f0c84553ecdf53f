# BEVFusion-OCC: multi-task detection + semantic occupancy.
# Parity: reference configs/bevfusion_NewScenes/bevfusion_occ.py
# (SC IoU 27.02 / mIoU 16.24 in the reference model zoo).

_base_ = ['bevfusion.py']

model_type = 'bevfusion_mtl'
work_dir = 'work_dirs/bevfusion_occ'

occ_class_names = ['car', 'pedestrian', 'rider', 'large_vehicle', 'cycle',
                   'road_obstacle', 'traffic_fence', 'driveable_surface',
                   'sidewalk', 'vegetation', 'manmade']

model = dict(
    occ_classes=12,        # 11 semantic + free
    occ_dz=16,
    task_weights=(1.0, 1.0),
)

data = dict(
    train=dict(load_occ=True, occ_size=(240, 160, 16)),
    val=dict(load_occ=True, occ_size=(240, 160, 16)),
)
