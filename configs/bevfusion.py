# BEVFusion: camera (LSS + DepthNet) + 4D radar pillars.
# Parity: reference configs/bevfusion_NewScenes/bevfusion.py
# (mAP 33.95 / ODS 43.00 in the reference model zoo).
#
# Staged pretraining (reference :288-290): set load_lift_from to a
# trained LSS checkpoint dir and load_pts_from to radar pillars.

point_cloud_range = [-60, -40, -3.0, 60, 40, 5.0]

dataroot = 'data/NewScenes_Final'
version = 'v1.0-trainval'
eval_set = 'val'
work_dir = 'work_dirs/bevfusion'
model_type = 'bevfusion'

img_depth_loss_weight = 1.0
load_lift_from = None
load_pts_from = None

model = dict(
    camera_stream=True,
    radar_stream=True,
    lc_fusion=True,
    se=True,
    use_depthnet=True,
    num_views=6,
    imc=256,
    lic=384,
    resnet_depth=50,
    lss=dict(
        final_dim=(544, 960),
        downsample=4,
        camera_depth_range=(1.0, 60.0, 1.0),
        pc_range=tuple(point_cloud_range),
        grid=0.5,
        num_views=6,
        inputC=256,
        camC=64,
        outC=256,
    ),
    pillars=dict(
        point_cloud_range=tuple(point_cloud_range),
        voxel_size=(0.25, 0.25, 8.0),
        max_voxels=30000,
        max_points_per_voxel=10,
        bev_hw=(320, 480),
        pfn_channels=(64,),
        num_classes=4,
    ),
)

data = dict(
    samples_per_device=1,
    train=dict(
        ann_file=dataroot + '/newscenes-final_infos_temporal_train.pkl',
        modality='radar',
        use_camera=True,
        load_depth_gt=True,
        depth_stride=4,
        camera_depth_range=(1.0, 60.0, 1.0),
        image_target_hw=(544, 960),
        pc_range=point_cloud_range,
        max_points=40000,
        radar_sweeps=3,
        use_valid_flag=True,
        point_shuffle=True,
    ),
    val=dict(
        ann_file=dataroot + '/newscenes-final_infos_temporal_val.pkl',
        modality='radar',
        use_camera=True,
        image_target_hw=(544, 960),
        pc_range=point_cloud_range,
        max_points=40000,
        radar_sweeps=3,
        test_mode=True,
    ),
)

optimizer = dict(lr=2e-4, weight_decay=0.01)
grad_clip_norm = 35.0
lr_config = dict(policy='cosine', warmup_iters=500, warmup_ratio=1.0 / 3)
total_epochs = 24
log_interval = 50
ckpt_interval = 1
eval_interval = 24
