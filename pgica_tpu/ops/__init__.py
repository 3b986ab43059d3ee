"""pgica_tpu.ops subpackage."""
