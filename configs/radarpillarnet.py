# RadarPillarNet: radar pillars with velocity/SNR-center features.
# Parity: reference configs/RCFusion_NewScenes/radar_stream/RadarPillarNet.py
# (mAP 24.88 / ODS 37.81 in the reference model zoo).

_base_ = ['pointpillars_radar.py']

model_type = 'radarpillarnet'
work_dir = 'work_dirs/radarpillarnet'

model = dict(with_velocity_snr_center=True)
