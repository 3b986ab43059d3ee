"""pgica_tpu.parallel subpackage."""
