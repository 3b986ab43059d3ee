"""pgica_tpu.core subpackage."""
from pgica_tpu.core.precision import compute_dtype, cast_floating
