"""pgica_tpu.models subpackage."""
