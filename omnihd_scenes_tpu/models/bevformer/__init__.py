from omnihd_scenes_tpu.models.bevformer.detector import (BEVFormerConfig,
                                                         BEVFormerDetector,
                                                         grid_mask)
from omnihd_scenes_tpu.models.bevformer.head import (BEVFormerHead,
                                                     DETRLossCfg,
                                                     bevformer_head_loss)

__all__ = ['BEVFormerConfig', 'BEVFormerDetector', 'grid_mask',
           'BEVFormerHead', 'DETRLossCfg', 'bevformer_head_loss']
