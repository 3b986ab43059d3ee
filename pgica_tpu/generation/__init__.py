"""pgica_tpu.generation subpackage."""
from pgica_tpu.generation.decode import generate
