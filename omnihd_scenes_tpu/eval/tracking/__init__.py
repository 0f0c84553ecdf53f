from omnihd_scenes_tpu.eval.tracking.evaluate import TrackingEval
from omnihd_scenes_tpu.eval.tracking.data_classes import (TrackingBox,
                                                          TrackingConfig)

__all__ = ['TrackingEval', 'TrackingBox', 'TrackingConfig']
