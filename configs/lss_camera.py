# LSS camera-only baseline (BEVFUSION_depth with camera stream only).
# Parity: reference configs/bevfusion_NewScenes/cam_stream/LSS.py
# (mAP 22.44 / ODS 26.01 in the reference model zoo).

_base_ = ['bevfusion.py']

model_type = 'lss'
work_dir = 'work_dirs/lss_camera'

model = dict(
    radar_stream=False,
    lc_fusion=False,
    se=False,
)

data = dict(
    train=dict(modality='camera'),
    val=dict(modality='camera'),
)
