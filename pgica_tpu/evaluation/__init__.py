"""pgica_tpu.evaluation subpackage."""
