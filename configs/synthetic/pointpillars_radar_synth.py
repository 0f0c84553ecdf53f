# Tiny 4D-radar PointPillars on the synthetic dataset — CI / smoke-test
# scale.  dataroot must be overridden: --cfg-options dataroot=/path

point_cloud_range = [-60, -40, -3.0, 60, 40, 5.0]
voxel_size = [1.0, 1.0, 8]

dataroot = '/tmp/newscenes_synth'
version = 'v1.0-mini'
eval_set = 'val_mini'
work_dir = '/tmp/work_dirs/pp_radar_synth'

model = dict(
    point_cloud_range=tuple(point_cloud_range),
    voxel_size=tuple(voxel_size),
    max_voxels=2048,
    max_points_per_voxel=8,
    bev_hw=(80, 120),
    pfn_channels=(32,),
    second_channels=(32, 64, 64),
    fpn_channels=(32, 32, 32),
    num_classes=4,
)

data = dict(
    samples_per_device=2,
    train=dict(
        ann_file=dataroot + '/synth_infos_temporal_train.pkl',
        modality='radar',
        pc_range=point_cloud_range,
        max_points=3000,
        radar_sweeps=3,
        use_valid_flag=True,
        point_shuffle=True,
        max_gt=32,
    ),
    val=dict(
        ann_file=dataroot + '/synth_infos_temporal_val.pkl',
        modality='radar',
        pc_range=point_cloud_range,
        max_points=3000,
        radar_sweeps=3,
        test_mode=True,
        max_gt=32,
    ),
)

optimizer = dict(lr=0.001, weight_decay=0.01)
grad_clip_norm = 35.0
lr_config = dict(policy='cosine', warmup_iters=10, warmup_ratio=0.1)
total_epochs = 2
log_interval = 1
ckpt_interval = 2
eval_interval = 2
