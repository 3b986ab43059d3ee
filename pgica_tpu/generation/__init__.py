"""pgica_tpu.generation subpackage."""
