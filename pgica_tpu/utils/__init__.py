"""pgica_tpu.utils subpackage."""
