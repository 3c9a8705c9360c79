from tpupose.configs.default import Config, default_config
from tpupose.configs.parser import parse_args, update_config, load_config

__all__ = ["Config", "default_config", "parse_args", "update_config", "load_config"]
