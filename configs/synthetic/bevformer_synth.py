# Tiny BEVFormer on the synthetic dataset — CI / smoke-test scale.

point_cloud_range = [-60, -40, -3.0, 60, 40, 5.0]

dataroot = '/tmp/newscenes_synth'
version = 'v1.0-mini'
eval_set = 'val_mini'
work_dir = '/tmp/work_dirs/bevformer_synth'
model_type = 'bevformer'
dataset_type = 'temporal'

model = dict(
    bev_h=16,
    bev_w=24,
    num_query=32,
    num_classes=4,
    embed_dims=64,
    encoder_layers=1,
    decoder_layers=2,
    num_cams=6,
    queue_length=2,
    pc_range=tuple(point_cloud_range),
    resnet_depth=18,
    resnet_out_indices=(3,),
    fpn_outs=1,
    img_hw=(128, 192),
)

data = dict(
    samples_per_device=1,
    train=dict(
        ann_file=dataroot + '/synth_infos_temporal_train.pkl',
        queue_length=2,
        image_scale=1.0,
        front_back_scale=1.0,
        image_target_hw=(128, 192),
        pc_range=point_cloud_range,
        max_gt=16,
        use_valid_flag=True,
    ),
    val=dict(
        ann_file=dataroot + '/synth_infos_temporal_val.pkl',
        queue_length=2,
        image_scale=1.0,
        front_back_scale=1.0,
        image_target_hw=(128, 192),
        pc_range=point_cloud_range,
        max_gt=16,
        test_mode=True,
    ),
)

optimizer = dict(lr=2e-4, weight_decay=0.01)
grad_clip_norm = 35.0
lr_config = dict(policy='cosine', warmup_iters=5, warmup_ratio=0.1)
total_epochs = 1
log_interval = 1
ckpt_interval = 1
eval_interval = 100
