"""pgica_tpu.evaluation subpackage (lazy: metrics pull numpy-only deps)."""

_LAZY = {
    "CaptioningMetrics": ("pgica_tpu.evaluation.metrics", "CaptioningMetrics"),
    "word_tokenize": ("pgica_tpu.evaluation.metrics", "word_tokenize"),
    "EvaluationRunner": ("pgica_tpu.evaluation.runner", "EvaluationRunner"),
}

__all__ = sorted(_LAZY)


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        value = getattr(importlib.import_module(mod), attr)
        globals()[name] = value
        return value
    raise AttributeError(name)
