from avlen_tpu.config.node import CN, ConfigNode
from avlen_tpu.config.default import get_config, get_task_config

__all__ = ["CN", "ConfigNode", "get_config", "get_task_config"]
