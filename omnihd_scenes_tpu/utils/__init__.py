from omnihd_scenes_tpu.utils.quaternion import Quaternion

__all__ = ['Quaternion']
