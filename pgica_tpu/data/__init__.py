"""pgica_tpu.data subpackage."""
