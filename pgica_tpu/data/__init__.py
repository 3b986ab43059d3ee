"""pgica_tpu.data subpackage."""
from pgica_tpu.data.tokenizer import CaptionTokenizer
from pgica_tpu.data.preprocessing import ImageProcessor, TextProcessor
from pgica_tpu.data.loader import (
    ConceptualCaptionsDataset,
    UltraFeedbackDataset,
    DataLoader,
    create_dataloaders,
)

__all__ = [
    "CaptionTokenizer",
    "ImageProcessor",
    "TextProcessor",
    "ConceptualCaptionsDataset",
    "UltraFeedbackDataset",
    "DataLoader",
    "create_dataloaders",
]
