"""OmniHD-Scenes TPU: a TPU-native (JAX/XLA/Pallas) rebuild of the
OmniHD-Scenes multimodal 3D perception stack — dataset SDK, evaluation
suite, data pipeline, detection/occupancy models and training runtime.
"""

__version__ = '0.1.0'
