from mistralrs_tpu.vision import transforms
from mistralrs_tpu.vision.vit import VisionConfig, VisionParams, vit_forward

__all__ = ["VisionConfig", "VisionParams", "transforms", "vit_forward"]
