"""pgica_tpu.core subpackage."""
