# BEVFormer-T (temporal, R50, 544x960).
# Parity: reference configs/bevformer_NewScenes/bevformer_T_R50.py
# (mAP 29.17 / ODS 30.54 in the reference model zoo).

point_cloud_range = [-60, -40, -3.0, 60, 40, 5.0]

dataroot = 'data/NewScenes_Final'
version = 'v1.0-trainval'
eval_set = 'val'
work_dir = 'work_dirs/bevformer_t_r50'
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
    resnet_depth=50,
    resnet_out_indices=(3,),
    fpn_outs=1,
    img_hw=(544, 960),
)

data = dict(
    samples_per_device=1,
    train=dict(
        ann_file=dataroot + '/newscenes-final_infos_temporal_train.pkl',
        queue_length=3,
        image_target_hw=(544, 960),
        pc_range=point_cloud_range,
        use_valid_flag=True,
    ),
    val=dict(
        ann_file=dataroot + '/newscenes-final_infos_temporal_val.pkl',
        queue_length=3,
        image_target_hw=(544, 960),
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
