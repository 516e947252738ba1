from animate3d_tpu.core.registry import register, find, registered  # noqa: F401
from animate3d_tpu.core.schedule import C  # noqa: F401
from animate3d_tpu.core.config import load_config, parse_structured  # noqa: F401
