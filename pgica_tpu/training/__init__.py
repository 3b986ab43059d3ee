"""pgica_tpu.training subpackage."""
