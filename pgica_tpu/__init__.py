"""pgica_tpu — TPU-native preference-guided image captioning alignment.

A ground-up JAX/Flax/Pallas/pjit re-design of
A-SHOJAEI/preference-guided-image-captioning-alignment: Stage 1 contrastively
aligns a CLIP-style ViT vision tower with a GPT-2-style text tower via NT-Xent
(global negatives all-gathered over the ICI mesh); Stage 2 fine-tunes a
cross-attention caption decoder with DPO on preference pairs; plus a full
caption-quality evaluation suite.

Public surface mirrors the reference package API (reference
pkg/__init__.py:16-43) with lazy imports so that importing the package does not
pull in JAX/model code.
"""

from typing import TYPE_CHECKING

__version__ = "0.1.0"

_LAZY = {
    "Config": ("pgica_tpu.utils.config", "Config"),
    "PreferenceGuidedCaptioningModel": ("pgica_tpu.models.model", "PreferenceGuidedCaptioningModel"),
    "ConceptualCaptionsDataset": ("pgica_tpu.data.loader", "ConceptualCaptionsDataset"),
    "UltraFeedbackDataset": ("pgica_tpu.data.loader", "UltraFeedbackDataset"),
    "create_dataloaders": ("pgica_tpu.data.loader", "create_dataloaders"),
    "ImageProcessor": ("pgica_tpu.data.preprocessing", "ImageProcessor"),
    "TextProcessor": ("pgica_tpu.data.preprocessing", "TextProcessor"),
    "PreferenceGuidedTrainer": ("pgica_tpu.training.trainer", "PreferenceGuidedTrainer"),
    "CaptioningMetrics": ("pgica_tpu.evaluation.metrics", "CaptioningMetrics"),
    "EvaluationRunner": ("pgica_tpu.evaluation.runner", "EvaluationRunner"),
    "MeshContext": ("pgica_tpu.parallel.mesh", "MeshContext"),
}

__all__ = sorted(_LAZY) + ["__version__"]


def __getattr__(name: str):
    if name in _LAZY:
        module_name, attr = _LAZY[name]
        import importlib

        module = importlib.import_module(module_name)
        value = getattr(module, attr)
        globals()[name] = value
        return value
    raise AttributeError(f"module 'pgica_tpu' has no attribute {name!r}")


if TYPE_CHECKING:  # pragma: no cover
    from pgica_tpu.utils.config import Config  # noqa: F401
