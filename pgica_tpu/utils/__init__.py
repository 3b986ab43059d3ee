"""pgica_tpu.utils subpackage."""
from pgica_tpu.utils.config import Config, coerce_env_value, ENV_OVERRIDES
from pgica_tpu.utils.logging_config import configure_logging
