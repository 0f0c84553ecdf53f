# Tiny BEVFusion-MTL on the synthetic dataset — CI / smoke-test scale.
# Override dataroot + ann_files via --cfg-options.

point_cloud_range = [-60, -40, -3.0, 60, 40, 5.0]

dataroot = '/tmp/newscenes_synth'
version = 'v1.0-mini'
eval_set = 'val_mini'
work_dir = '/tmp/work_dirs/bevfusion_synth'
model_type = 'bevfusion_mtl'

model = dict(
    camera_stream=True,
    radar_stream=True,
    lc_fusion=True,
    se=True,
    use_depthnet=False,
    num_views=6,
    imc=32,
    lic=48,
    resnet_depth=18,
    resnet_out_indices=(1, 2, 3),
    occ_classes=12,
    occ_dz=16,
    lss=dict(
        final_dim=(128, 192),
        downsample=8,
        camera_depth_range=(1.0, 17.0, 1.0),
        pc_range=tuple(point_cloud_range),
        grid=2.0,              # 60 x 40 x 4 voxels
        num_views=6,
        inputC=32,
        camC=16,
        outC=32,
    ),
    pillars=dict(
        point_cloud_range=tuple(point_cloud_range),
        voxel_size=(2.0, 2.0, 8.0),
        max_voxels=1024,
        max_points_per_voxel=8,
        bev_hw=(40, 60),
        pfn_channels=(16,),
        second_channels=(16, 32, 32),
        fpn_channels=(16, 16, 16),
        num_classes=4,
    ),
)

data = dict(
    samples_per_device=1,
    train=dict(
        ann_file=dataroot + '/synth_infos_temporal_train.pkl',
        modality='radar',
        use_camera=True,
        image_scale=1.0,
        front_back_scale=1.0,
        image_target_hw=(128, 192),
        load_occ=True,
        occ_size=(240, 160, 16),
        occ_downsample=(8, 8, 1),
        pc_range=point_cloud_range,
        max_points=3000,
        radar_sweeps=3,
        max_gt=32,
        use_valid_flag=True,
    ),
    val=dict(
        ann_file=dataroot + '/synth_infos_temporal_val.pkl',
        modality='radar',
        use_camera=True,
        image_scale=1.0,
        front_back_scale=1.0,
        image_target_hw=(128, 192),
        load_occ=True,
        occ_size=(240, 160, 16),
        occ_downsample=(8, 8, 1),
        pc_range=point_cloud_range,
        max_points=3000,
        radar_sweeps=3,
        max_gt=32,
        test_mode=True,
    ),
)

test_cfg = dict(nms_pre=256, max_num=64)
optimizer = dict(lr=1e-3, weight_decay=0.01)
grad_clip_norm = 35.0
lr_config = dict(policy='cosine', warmup_iters=5, warmup_ratio=0.1)
total_epochs = 1
log_interval = 1
ckpt_interval = 1
eval_interval = 100
