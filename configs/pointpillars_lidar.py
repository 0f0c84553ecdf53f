# LiDAR PointPillars baseline.
# Parity: reference configs/PointPillars_NewScenes/pointpillars_LiDAR.py
# (mAP 61.15 / ODS 55.54 in the reference model zoo).

point_cloud_range = [-60, -40, -3.0, 60, 40, 5.0]
voxel_size = [0.25, 0.25, 8]

dataroot = 'data/NewScenes_Final'
version = 'v1.0-trainval'
eval_set = 'val'
work_dir = 'work_dirs/pointpillars_lidar'
model_type = 'pointpillars'

model = dict(
    point_cloud_range=tuple(point_cloud_range),
    voxel_size=tuple(voxel_size),
    max_voxels=30000,
    max_points_per_voxel=64,
    bev_hw=(320, 480),
    pfn_channels=(64,),
    num_classes=4,
)

data = dict(
    samples_per_device=8,
    train=dict(
        ann_file=dataroot + '/newscenes-final_infos_temporal_train.pkl',
        modality='lidar',
        lidar_load_dim=5,
        lidar_use_dim=4,
        pc_range=point_cloud_range,
        max_points=120000,
        use_valid_flag=True,
        point_shuffle=True,
    ),
    val=dict(
        ann_file=dataroot + '/newscenes-final_infos_temporal_val.pkl',
        modality='lidar',
        lidar_load_dim=5,
        lidar_use_dim=4,
        pc_range=point_cloud_range,
        max_points=120000,
        test_mode=True,
    ),
)

optimizer = dict(lr=0.001, weight_decay=0.01)
grad_clip_norm = 35.0
lr_config = dict(policy='step', warmup_iters=1000, warmup_ratio=0.001,
                 step=[20, 23])
total_epochs = 24
log_interval = 50
ckpt_interval = 1
eval_interval = 24
