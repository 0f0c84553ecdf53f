# BEVFormer-T (temporal, R101-DCN, 864x1536).
# Parity: reference configs/bevformer_NewScenes/bevformer_T_R101.py
# (mAP 32.22 / ODS 32.57 in the reference model zoo): ResNet-101 with
# DCNv2 on stages 3-4 (stage_with_dcn=(False, False, True, True)),
# images scaled x0.8 (1920x1080 -> 1536x864).

point_cloud_range = [-60, -40, -3.0, 60, 40, 5.0]

dataroot = 'data/NewScenes_Final'
version = 'v1.0-trainval'
eval_set = 'val'
work_dir = 'work_dirs/bevformer_t_r101'
model_type = 'bevformer'
dataset_type = 'temporal'

model = dict(
    bev_h=160,
    bev_w=240,
    num_query=900,
    num_classes=4,
    embed_dims=256,
    encoder_layers=3,
    decoder_layers=6,
    num_cams=6,
    queue_length=3,
    pc_range=tuple(point_cloud_range),
    resnet_depth=101,
    resnet_out_indices=(3,),
    stage_with_dcn=(False, False, True, True),
    fpn_outs=1,
    img_hw=(864, 1536),
)

data = dict(
    samples_per_device=1,
    train=dict(
        ann_file=dataroot + '/newscenes-final_infos_temporal_train.pkl',
        queue_length=3,
        image_target_hw=(864, 1536),
        image_scale=0.8,
        pc_range=point_cloud_range,
        use_valid_flag=True,
    ),
    val=dict(
        ann_file=dataroot + '/newscenes-final_infos_temporal_val.pkl',
        queue_length=3,
        image_target_hw=(864, 1536),
        image_scale=0.8,
        pc_range=point_cloud_range,
        test_mode=True,
    ),
)

optimizer = dict(lr=2e-4, weight_decay=0.01)
grad_clip_norm = 35.0
lr_config = dict(policy='cosine', warmup_iters=500, warmup_ratio=1.0 / 3,
                 min_lr_ratio=1e-3)
total_epochs = 24
log_interval = 50
ckpt_interval = 1
eval_interval = 24
