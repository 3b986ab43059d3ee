"""pgica_tpu.models subpackage."""
from pgica_tpu.models.presets import LMConfig, ViTConfig, get_text_config, get_vision_config
from pgica_tpu.models.vit import VisionEncoder, VisionTransformer, ProjectionHead
from pgica_tpu.models.encoders import TextEncoder, masked_mean_pool
from pgica_tpu.models.decoder import CaptionDecoder
from pgica_tpu.models.model import (
    PreferenceGuidedCaptioningModule,
    PreferenceGuidedCaptioningModel,
    build_module,
)
