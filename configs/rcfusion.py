# RCFusion: camera + radar with cross-modal spatial attention fusion.
# Parity: reference configs/RCFusion_NewScenes/rcfusion_lss.py
# (mAP 34.88 / ODS 41.53 in the reference model zoo).

_base_ = ['bevfusion.py']

model_type = 'rcfusion'
work_dir = 'work_dirs/rcfusion'

model = dict(rc_fusion='cross_attention')
